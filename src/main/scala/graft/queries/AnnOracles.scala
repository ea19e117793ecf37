package graft.queries

import graft.functions.VectorFunctions

/** DuckDB oracle SQL for the k-means ANN family (IVF / PQ / IVF-PQ /
  * SemDeDup / recall audit) — the chained-MATERIALIZED-CTE replay idiom
  * that flipped q83 (BPE merges) and q62 (MMR) from rows-only to
  * driver-green, applied to Lloyd training itself.
  *
  * Why this is legal: [[graft.operators.Similarity.ivfTrain]] /
  * [[graft.operators.Similarity.pqTrain]] are deterministic BY
  * CONSTRUCTION — md5(id)-ordered seeding, a fixed iteration count, and
  * per-dimension means rounded to 6 dp precisely so that float summation
  * order cannot leak into an assignment. Every other number in the
  * family is a left-fold over array indices 0..n-1 (dist², the unrolled
  * cosine, the m-term ADC sum), which SQL's left-associative `+`
  * reproduces bit-for-bit (the q31 parity result). So the oracle can
  * REPLAY training: seed from the row_number() over md5, run each Lloyd
  * step as (argmin assignment CTE, rounded-mean centroid CTE), and then
  * replay assignment / probing / ADC / re-rank on top of the final
  * centroids. The only cross-engine contact points are `round(avg(x), 6)`
  * cells — the same rounded-aggregate contract ~100 driver-green queries
  * already rely on.
  *
  * All CTEs are MATERIALIZED: each iteration references its predecessor
  * 2×, so plain CTEs would inline exponentially (the q83 lesson). */
private[queries] object AnnOracles {

  /** `name AS MATERIALIZED (body)` (or plain when `mat = false`). */
  private def cte(name: String, body: String, mat: Boolean = true): String =
    s"$name AS ${if (mat) "MATERIALIZED " else ""}($body)"

  /** Squared L2 distance with the exact fold order of
    * [[graft.operators.Similarity]]'s `dist2`: a left fold seeded with
    * 0.0 — `0 + t1 + t2 + …` left-associates identically. */
  private def d2Sql(v: String, c: String, dim: Int): String =
    "0 + " + (1 to dim)
      .map(i => s"($v[$i] - $c[$i]) * ($v[$i] - $c[$i])").mkString(" + ")

  /** (pos, x) struct explosion of a double-list column — the SQL twin of
    * `posexplode`, 0-based pos like Spark's. */
  private def posUnnest(src: String, dim: Int): String =
    s"unnest([{'pos': k - 1, 'x': $src[k]} for k in range(1, ${dim + 1})])"

  // ------------------------------------------------------------- IVF

  /** The IVF replay chain: `cvt` (double-cast corpus), `cent0` (md5
    * seeding), `iters` × (`asg$i` argmin assignment, `cent$i` rounded
    * means), and `asgf` — the final full-corpus assignment, i.e. the
    * oracle twin of the memoized `sharedIvf` index frame. An empty
    * cluster drops out of `cent$i` exactly as it drops out of the
    * Scala `cells.groupBy(_._1)` rebuild. */
  def ivfChain(dim: Int, nlist: Int, iters: Int): Seq[String] = {
    val head = Seq(
      cte("cvt", s"""
        |  SELECT vec_id AS corpus_id,
        |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
        |  FROM embeddings""".stripMargin),
      cte("cent0", s"""
        |  SELECT CAST(rn - 1 AS INT) AS cid, cv AS cent FROM (
        |    SELECT row_number() OVER (
        |        ORDER BY md5(CAST(corpus_id AS VARCHAR))) AS rn, cv
        |    FROM cvt) WHERE rn <= $nlist""".stripMargin))
    val steps = (1 to iters).flatMap { i =>
      Seq(
        cte(s"asg$i", assignBody(s"cent${i - 1}", dim)),
        cte(s"cent$i", s"""
          |  SELECT cid, list(m ORDER BY pos) AS cent FROM (
          |    SELECT cid, pos, round(avg(x), 6) AS m FROM (
          |      SELECT cid, u.pos AS pos, u.x AS x FROM (
          |        SELECT cid, ${posUnnest("cv", dim)} AS u FROM asg$i))
          |    GROUP BY cid, pos)
          |  GROUP BY cid""".stripMargin))
    }
    head ++ steps :+ cte("asgf", assignBody(s"cent$iters", dim))
  }

  private def assignBody(centTable: String, dim: Int): String = s"""
    |  SELECT corpus_id, cv, cid FROM (
    |    SELECT v.corpus_id, v.cv, c.cid,
    |      row_number() OVER (PARTITION BY v.corpus_id
    |        ORDER BY ${d2Sql("v.cv", "c.cent", dim)}, c.cid) AS r
    |    FROM cvt v, $centTable c) WHERE r = 1""".stripMargin

  /** Query set + nprobe-nearest-centroid probe CTEs (the
    * `array_sort(distStructs)` slice of `ivfProbe`/`ivfPqTopK`). */
  def probeChain(dim: Int, nQueries: Int, iters: Int,
                 nprobe: Int): Seq[String] = Seq(
    cte("q", s"""
      |  SELECT vec_id AS query_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id < $nQueries""".stripMargin),
    cte("probe", s"""
      |  SELECT query_id, qv, cid FROM (
      |    SELECT q.query_id, q.qv, c.cid,
      |      row_number() OVER (PARTITION BY q.query_id
      |        ORDER BY ${d2Sql("q.qv", "c.cent", dim)}, c.cid) AS r
      |    FROM q, cent$iters c) WHERE r <= $nprobe""".stripMargin))

  /** Cosine top-k tail shared by every ANN probe (`scored` must expose
    * query_id, corpus_id, cosine). */
  private def topKTail(k: Int): String = s"""
    |SELECT query_id, corpus_id, cosine, CAST(rn AS INT) AS rn FROM (
    |  SELECT query_id, corpus_id, cosine,
    |    row_number() OVER (PARTITION BY query_id
    |      ORDER BY cosine DESC, corpus_id) AS rn
    |  FROM scored)
    |WHERE rn <= $k
    |ORDER BY query_id, rn""".stripMargin

  /** Full q32b oracle: IVF train replay + probe + bucket-confined cosine
    * top-k. */
  def ivfTopKSql(dim: Int, nlist: Int, iters: Int, nQueries: Int,
                 nprobe: Int, k: Int): String = {
    val scored = cte("scored", s"""
      |  SELECT p.query_id, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("p.qv", "a.cv", dim)}, 6) AS cosine
      |  FROM probe p JOIN asgf a USING (cid)
      |  WHERE a.corpus_id <> p.query_id""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) ++
      probeChain(dim, nQueries, iters, nprobe) :+ scored).mkString(",\n") +
      "\n" + topKTail(k)
  }

  /** Full q124 oracle: [[ivfTopKSql]] with the attribute filter — only
    * corpus vectors sharing the query's label are scored, applied
    * before the cosine exactly like the operator's pre-filter. */
  def ivfTopKFilteredSql(dim: Int, nlist: Int, iters: Int, nQueries: Int,
                         nprobe: Int, k: Int): String = {
    val scored = cte("scored", s"""
      |  SELECT p.query_id, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("p.qv", "a.cv", dim)}, 6) AS cosine
      |  FROM probe p
      |  JOIN asgf a USING (cid)
      |  JOIN embeddings ea ON ea.vec_id = a.corpus_id
      |  JOIN embeddings eq ON eq.vec_id = p.query_id
      |  WHERE ea.label = eq.label AND a.corpus_id <> p.query_id""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) ++
      probeChain(dim, nQueries, iters, nprobe) :+ scored).mkString(",\n") +
      "\n" + topKTail(k)
  }

  /** Full q125 oracle: IVF train + probe replay with per-(query, label)
    * quota ranking instead of one global top-k. */
  def ivfTopKGroupedSql(dim: Int, nlist: Int, iters: Int, nQueries: Int,
                        nprobe: Int, perGroupK: Int): String = {
    val scored = cte("scored", s"""
      |  SELECT p.query_id, ea.label AS label, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("p.qv", "a.cv", dim)}, 6) AS cosine
      |  FROM probe p
      |  JOIN asgf a USING (cid)
      |  JOIN embeddings ea ON ea.vec_id = a.corpus_id
      |  WHERE a.corpus_id <> p.query_id""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) ++
      probeChain(dim, nQueries, iters, nprobe) :+ scored).mkString(",\n") + s"""
      |SELECT query_id, label, corpus_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT query_id, label, corpus_id, cosine,
      |    row_number() OVER (PARTITION BY query_id, label
      |      ORDER BY cosine DESC, corpus_id) AS rn
      |  FROM scored)
      |WHERE rn <= $perGroupK
      |ORDER BY query_id, label, rn""".stripMargin
  }

  /** Full q130 oracle: IVF train replay + the WIDENED grouped probe —
    * per-(cid, label) census, self-exclusion-adjusted cumulative
    * prefix over each query's distance-ranked centroid list, default
    * lists ∪ minimal quota prefix, then the per-(query, label) quota
    * window. Replays [[graft.operators.Similarity.ivfProbeGroupedWidened]]
    * clause-for-clause. */
  def ivfTopKGroupedWidenedSql(dim: Int, nlist: Int, iters: Int,
                               nQueries: Int, nprobe: Int,
                               perGroupK: Int): String = {
    val rank = cte("rank", s"""
      |  SELECT q.query_id, q.qv, c.cid,
      |    row_number() OVER (PARTITION BY q.query_id
      |      ORDER BY ${d2Sql("q.qv", "c.cent", dim)}, c.cid) AS pr
      |  FROM q, cent$iters c""".stripMargin)
    val cnts = cte("cnts", s"""
      |  SELECT a.cid, ea.label, count(*) AS cnt
      |  FROM asgf a JOIN embeddings ea ON ea.vec_id = a.corpus_id
      |  GROUP BY a.cid, ea.label""".stripMargin)
    val selfloc = cte("selfloc", s"""
      |  SELECT a.corpus_id AS query_id, a.cid AS scid, ea.label AS sg
      |  FROM asgf a JOIN embeddings ea ON ea.vec_id = a.corpus_id
      |  WHERE a.corpus_id < $nQueries""".stripMargin)
    val widen = cte("widen", s"""
      |  SELECT query_id, qv, label, cid FROM (
      |    SELECT r.query_id, r.qv, n.label, r.cid, r.pr,
      |      coalesce(sum(n.cnt - CASE WHEN r.cid = s.scid
      |          AND n.label = s.sg THEN 1 ELSE 0 END)
      |        OVER (PARTITION BY r.query_id, n.label ORDER BY r.pr
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      |        AS cum_before
      |    FROM rank r
      |    JOIN cnts n ON n.cid = r.cid
      |    LEFT JOIN selfloc s ON s.query_id = r.query_id)
      |  WHERE pr <= $nprobe OR cum_before < $perGroupK""".stripMargin)
    val scored = cte("scored", s"""
      |  SELECT w.query_id, w.label, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("w.qv", "a.cv", dim)}, 6) AS cosine
      |  FROM widen w
      |  JOIN asgf a ON a.cid = w.cid
      |  JOIN embeddings ea ON ea.vec_id = a.corpus_id AND ea.label = w.label
      |  WHERE a.corpus_id <> w.query_id""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) ++
      Seq(probeChain(dim, nQueries, iters, nprobe).head) ++
      Seq(rank, cnts, selfloc, widen, scored)).mkString(",\n") + s"""
      |SELECT query_id, label, corpus_id, cosine, CAST(rn AS INT) AS rn FROM (
      |  SELECT query_id, label, corpus_id, cosine,
      |    row_number() OVER (PARTITION BY query_id, label
      |      ORDER BY cosine DESC, corpus_id) AS rn
      |  FROM scored)
      |WHERE rn <= $perGroupK
      |ORDER BY query_id, label, rn""".stripMargin
  }

  /** Full q72 oracle: IVF train replay + the semDedup eviction rule
    * (same-cluster neighbor with cosine ≥ τ and a smaller id). */
  def semDedupSql(dim: Int, nlist: Int, iters: Int, tau: Double): String = {
    val evict = cte("evict", s"""
      |  SELECT DISTINCT a.corpus_id AS id_a
      |  FROM asgf a JOIN asgf b
      |    ON a.cid = b.cid AND b.corpus_id < a.corpus_id
      |  WHERE round(${VectorFunctions.cosineSql("a.cv", "b.cv", dim)}, 6)
      |    >= $tau""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) :+ evict).mkString(",\n") + s"""
      |SELECT a.corpus_id AS vec_id, a.cid AS cid,
      |  (e.id_a IS NULL) AS kept
      |FROM asgf a LEFT JOIN evict e ON e.id_a = a.corpus_id
      |ORDER BY vec_id""".stripMargin
  }

  // -------------------------------------------------------------- PQ

  /** Explicit double sublist for subspace `s` (elements s·dsub+1 …) —
    * explicit element lists instead of slice syntax so the oracle has no
    * engine-specific slicing semantics to get wrong. */
  private def subList(src: String, s: Int, dsub: Int): String =
    (1 to dsub).map(i => s"$src[${s * dsub + i}]").mkString("[", ", ", "]")

  private def subStructs(src: String, m: Int, dsub: Int): String =
    (0 until m).map(s => s"{'sub': $s, 'sv': ${subList(src, s, dsub)}}")
      .mkString("unnest([", ", ", "])")

  /** The PQ replay chain: `sv` (per-subspace explosion), `book0` (the
    * ksub smallest-md5 docs seed every subspace), `iters` × (`pasg$i`
    * per-(row, sub) argmin, `book$i` rounded means with empty cells
    * keeping their previous centroid — the LEFT JOIN coalesce), and
    * `codesf` — each corpus row's m codes in subspace order. Requires
    * `cvt` from [[ivfChain]] (or [[cvtOnly]]). */
  def pqChain(dim: Int, m: Int, ksub: Int, iters: Int): Seq[String] = {
    val dsub = dim / m
    val head = Seq(
      cte("sv", s"""
        |  SELECT corpus_id, u.sub AS sub, u.sv AS sv FROM (
        |    SELECT corpus_id, ${subStructs("cv", m, dsub)} AS u
        |    FROM cvt)""".stripMargin),
      cte("book0", s"""
        |  SELECT s.sub AS sub,
        |    CAST(row_number() OVER (PARTITION BY s.sub ORDER BY d.h) - 1
        |      AS INT) AS cid,
        |    s.sv AS cent
        |  FROM (SELECT corpus_id, h FROM (
        |          SELECT corpus_id, md5(CAST(corpus_id AS VARCHAR)) AS h,
        |            row_number() OVER (
        |              ORDER BY md5(CAST(corpus_id AS VARCHAR))) AS rn
        |          FROM cvt) WHERE rn <= $ksub) d
        |  JOIN sv s USING (corpus_id)""".stripMargin))
    val steps = (1 to iters).flatMap { i =>
      Seq(
        cte(s"pasg$i", s"""
          |  SELECT corpus_id, sub, sv, cid FROM (
          |    SELECT v.corpus_id, v.sub, v.sv, b.cid,
          |      row_number() OVER (PARTITION BY v.corpus_id, v.sub
          |        ORDER BY ${d2Sql("v.sv", "b.cent", dsub)}, b.cid) AS r
          |    FROM sv v JOIN book${i - 1} b ON b.sub = v.sub)
          |  WHERE r = 1""".stripMargin),
        cte(s"book$i", s"""
          |  SELECT sub, cid, list(m ORDER BY pos) AS cent FROM (
          |    SELECT p.sub AS sub, p.cid AS cid, p.pos AS pos,
          |      coalesce(c.m, p.x) AS m
          |    FROM (SELECT sub, cid, u.pos AS pos, u.x AS x FROM (
          |            SELECT sub, cid, ${posUnnest("cent", dsub)} AS u
          |            FROM book${i - 1})) p
          |    LEFT JOIN (SELECT sub, cid, pos, round(avg(x), 6) AS m FROM (
          |                 SELECT sub, cid, u.pos AS pos, u.x AS x FROM (
          |                   SELECT sub, cid, ${posUnnest("sv", dsub)} AS u
          |                   FROM pasg$i))
          |               GROUP BY sub, cid, pos) c
          |      ON c.sub = p.sub AND c.cid = p.cid AND c.pos = p.pos)
          |  GROUP BY sub, cid""".stripMargin))
    }
    val tail = Seq(
      cte("pasgf", s"""
        |  SELECT corpus_id, sub, cid FROM (
        |    SELECT v.corpus_id, v.sub, b.cid,
        |      row_number() OVER (PARTITION BY v.corpus_id, v.sub
        |        ORDER BY ${d2Sql("v.sv", "b.cent", dsub)}, b.cid) AS r
        |    FROM sv v JOIN book$iters b ON b.sub = v.sub)
        |  WHERE r = 1""".stripMargin),
      cte("codesf", s"""
        |  SELECT corpus_id, list(cid ORDER BY sub) AS codes
        |  FROM pasgf GROUP BY corpus_id""".stripMargin))
    head ++ steps ++ tail
  }

  /** Per-query ADC tables (`tabs[s+1][c+1]` = ‖qv_sub − cent‖²), nested
    * in (sub, cid) order like `adcTables`. Requires `q` (probeChain or
    * [[queryOnly]]). */
  def adcTabChain(dim: Int, m: Int, iters: Int): Seq[String] = {
    val dsub = dim / m
    Seq(
      cte("qsv", s"""
        |  SELECT query_id, u.sub AS sub, u.sv AS sv FROM (
        |    SELECT query_id, ${subStructs("qv", m, dsub)} AS u FROM q)"""
        .stripMargin),
      cte("tabs", s"""
        |  SELECT query_id, list(tl ORDER BY sub) AS tabs FROM (
        |    SELECT query_id, sub, list(d2 ORDER BY cid) AS tl FROM (
        |      SELECT s.query_id, b.sub, b.cid,
        |        ${d2Sql("s.sv", "b.cent", dsub)} AS d2
        |      FROM qsv s JOIN book$iters b USING (sub))
        |    GROUP BY query_id, sub)
        |  GROUP BY query_id""".stripMargin))
  }

  /** The m-term ADC sum with `adcScore`'s exact left-fold order (no
    * leading zero: reduceLeft over lookups s = 0..m−1). */
  private def adcSql(tabs: String, codes: String, m: Int): String =
    (1 to m).map(s => s"$tabs[$s][$codes[$s] + 1]").mkString(" + ")

  /** ADC-refine + exact-cosine re-rank tail shared by q95/q99: `cand`
    * rows must expose (query_id, corpus_id, adc-orderable candidates).
    * `candFrom` supplies the FROM/WHERE of the candidate generator. */
  private def adcTopK(dim: Int, m: Int, k: Int, refine: Int,
                      candFrom: String): Seq[String] = Seq(
    cte("cand", s"""
      |  SELECT query_id, corpus_id FROM (
      |    SELECT t.query_id, c.corpus_id,
      |      row_number() OVER (PARTITION BY t.query_id
      |        ORDER BY ${adcSql("t.tabs", "c.codes", m)}, c.corpus_id)
      |        AS arn
      |    $candFrom) WHERE arn <= $refine""".stripMargin),
    cte("scored", s"""
      |  SELECT n.query_id, n.corpus_id,
      |    round(${VectorFunctions.cosineSql("q.qv", "v.cv", dim)}, 6)
      |      AS cosine
      |  FROM cand n JOIN q ON q.query_id = n.query_id
      |  JOIN cvt v ON v.corpus_id = n.corpus_id""".stripMargin))

  /** Full q95 oracle: PQ train replay + whole-corpus ADC scan + exact
    * re-rank of the top-`refine`. */
  def pqTopKSql(dim: Int, m: Int, ksub: Int, iters: Int, nQueries: Int,
                k: Int, refine: Int): String = {
    val chain =
      ivfChainHeadOnly() ++ pqChain(dim, m, ksub, iters) ++
        queryOnly(nQueries) ++ adcTabChain(dim, m, iters) ++
        adcTopK(dim, m, k, refine,
          s"""FROM tabs t, codesf c
             |    WHERE c.corpus_id <> t.query_id""".stripMargin)
    "WITH " + chain.mkString(",\n") + "\n" + topKTail(k)
  }

  /** Full q99 oracle: IVF train replay (probe lists) × PQ train replay
    * (ADC scan of the probed lists) + exact re-rank. */
  def ivfPqTopKSql(dim: Int, nlist: Int, ivfIters: Int, m: Int, ksub: Int,
                   pqIters: Int, nQueries: Int, k: Int, nprobe: Int,
                   refine: Int): String = {
    val chain =
      ivfChain(dim, nlist, ivfIters) ++ pqChain(dim, m, ksub, pqIters) ++
        probeChain(dim, nQueries, ivfIters, nprobe) ++
        adcTabChain(dim, m, pqIters) ++
        adcTopK(dim, m, k, refine,
          s"""FROM probe p
             |    JOIN asgf a USING (cid)
             |    JOIN codesf c ON c.corpus_id = a.corpus_id
             |    JOIN tabs t ON t.query_id = p.query_id
             |    WHERE a.corpus_id <> p.query_id""".stripMargin)
    "WITH " + chain.mkString(",\n") + "\n" + topKTail(k)
  }

  /** Full q109 oracle: brute-force ground truth + all three ANN replays
    * + the per-query overlap fractions (`annRecall`'s left join with
    * zero-fill). */
  def annRecallSql(dim: Int, nlist: Int, ivfIters: Int, m: Int, ksub: Int,
                   pqIters: Int, nQueries: Int, k: Int, nprobe: Int,
                   refine: Int): String = {
    def topKCte(name: String, scoredBody: String): Seq[String] = Seq(
      cte(s"${name}_s", scoredBody),
      cte(name, s"""
        |  SELECT query_id, corpus_id FROM (
        |    SELECT query_id, corpus_id,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, corpus_id) AS rn
        |    FROM ${name}_s) WHERE rn <= $k""".stripMargin))
    val exact = topKCte("r_exact", s"""
      |  SELECT q.query_id, v.corpus_id,
      |    round(${VectorFunctions.cosineSql("q.qv", "v.cv", dim)}, 6)
      |      AS cosine
      |  FROM q, cvt v WHERE v.corpus_id <> q.query_id""".stripMargin)
    val ivf = topKCte("r_ivf", s"""
      |  SELECT p.query_id, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("p.qv", "a.cv", dim)}, 6)
      |      AS cosine
      |  FROM probe p JOIN asgf a USING (cid)
      |  WHERE a.corpus_id <> p.query_id""".stripMargin)
    // PQ / IVF-PQ candidates, then exact re-rank — mirrors adcTopK but
    // with per-method CTE names so all three coexist in one statement.
    def adcCand(name: String, candFrom: String): Seq[String] = Seq(
      cte(s"${name}_c", s"""
        |  SELECT query_id, corpus_id FROM (
        |    SELECT t.query_id, c.corpus_id,
        |      row_number() OVER (PARTITION BY t.query_id
        |        ORDER BY ${adcSql("t.tabs", "c.codes", m)}, c.corpus_id)
        |        AS arn
        |    $candFrom) WHERE arn <= $refine""".stripMargin)) ++
      topKCte(name, s"""
        |  SELECT n.query_id, n.corpus_id,
        |    round(${VectorFunctions.cosineSql("q.qv", "v.cv", dim)}, 6)
        |      AS cosine
        |  FROM ${name}_c n JOIN q ON q.query_id = n.query_id
        |  JOIN cvt v ON v.corpus_id = n.corpus_id""".stripMargin)
    val pq = adcCand("r_pq",
      s"""FROM tabs t, codesf c
         |    WHERE c.corpus_id <> t.query_id""".stripMargin)
    val ivfpq = adcCand("r_ivfpq",
      s"""FROM probe p
         |    JOIN asgf a USING (cid)
         |    JOIN codesf c ON c.corpus_id = a.corpus_id
         |    JOIN tabs t ON t.query_id = p.query_id
         |    WHERE a.corpus_id <> p.query_id""".stripMargin)
    val recall = Seq("ivf" -> "r_ivf", "pq" -> "r_pq", "ivf_pq" -> "r_ivfpq")
      .map { case (label, t) =>
        s"""SELECT '$label' AS method, e.query_id,
           |  coalesce(h.n, 0) AS n_hits,
           |  round(coalesce(h.n, 0) / CAST($k AS DOUBLE), 4) AS recall
           |FROM (SELECT DISTINCT query_id FROM r_exact) e
           |LEFT JOIN (SELECT x.query_id, count(*) AS n
           |           FROM r_exact x JOIN $t a
           |             ON a.query_id = x.query_id
           |            AND a.corpus_id = x.corpus_id
           |           GROUP BY x.query_id) h
           |  ON h.query_id = e.query_id""".stripMargin
      }.mkString("\nUNION ALL\n")
    val chain =
      ivfChain(dim, nlist, ivfIters) ++ pqChain(dim, m, ksub, pqIters) ++
        probeChain(dim, nQueries, ivfIters, nprobe) ++
        adcTabChain(dim, m, pqIters) ++ exact ++ ivf ++ pq ++ ivfpq
    "WITH " + chain.mkString(",\n") +
      s"\nSELECT method, query_id, n_hits, recall FROM (\n$recall\n)" +
      "\nORDER BY method, query_id"
  }

  /** Full q260 oracle: IVF train replay + the simplified-silhouette
    * report — per corpus vector the two smallest centroid distances
    * (own vs nearest rival), s = 1 − sqrt(a²)/sqrt(b²) on the 1e-6
    * grid, aggregated per cluster. Replays
    * [[graft.operators.Similarity.silhouetteReport]]'s exact fold
    * order and grid arithmetic on the replayed final centroids. */
  def silhouetteSql(dim: Int, nlist: Int, iters: Int): String = {
    val two = cte("two", s"""
      |  SELECT corpus_id, cid, d2, r FROM (
      |    SELECT v.corpus_id, c.cid,
      |      ${d2Sql("v.cv", "c.cent", dim)} AS d2,
      |      row_number() OVER (PARTITION BY v.corpus_id
      |        ORDER BY ${d2Sql("v.cv", "c.cent", dim)}, c.cid) AS r
      |    FROM cvt v, cent$iters c) WHERE r <= 2""".stripMargin)
    val s6 = cte("s6", s"""
      |  SELECT a.cid,
      |    CASE WHEN b.d2 = 0 THEN CAST(0 AS BIGINT)
      |      ELSE CAST(round(1e6 * (1.0 - sqrt(a.d2) / sqrt(b.d2)))
      |        AS BIGINT) END AS s6
      |  FROM (SELECT * FROM two WHERE r = 1) a
      |  JOIN (SELECT * FROM two WHERE r = 2) b USING (corpus_id)""".stripMargin)
    "WITH " + (ivfChain(dim, nlist, iters) ++ Seq(two, s6)).mkString(",\n") + s"""
      |SELECT cid, CAST(count(*) AS BIGINT) AS n_vecs,
      |  CAST(round(avg(s6)) AS BIGINT) AS mean_s6,
      |  CAST(sum(CASE WHEN s6 < 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_neg
      |FROM s6 GROUP BY cid ORDER BY cid""".stripMargin
  }

  /** Just `cvt` — for oracles that need the double-cast corpus but not
    * the IVF chain (q95). */
  private def ivfChainHeadOnly(): Seq[String] = Seq(
    cte("cvt", s"""
      |  SELECT vec_id AS corpus_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS cv
      |  FROM embeddings""".stripMargin))

  /** Just `q` — the query set without the probe (q95 scans everything). */
  private def queryOnly(nQueries: Int): Seq[String] = Seq(
    cte("q", s"""
      |  SELECT vec_id AS query_id,
      |    list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
      |  FROM embeddings WHERE vec_id < $nQueries""".stripMargin))
}
