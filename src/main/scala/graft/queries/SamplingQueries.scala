package graft.queries

import graft.Tables
import graft.functions.TextFunctions
import graft.operators.{Packing, Sampling}
import org.apache.spark.sql.functions._

/** Deterministic sampling surface — reproducible in any engine with md5
  * (the point: sampling decisions at 100 TB must be auditable and
  * re-derivable, not RNG state). */
object SamplingQueries {

  private val bkt = Sampling.hashBucketSql("doc_id", 100)

  /** ~20% deterministic sample of documents by doc_id hash. */
  val q44 = GQuery("q44_hash_sample",
    s"""SELECT doc_id, lang
       |FROM documents
       |WHERE $bkt < 20
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    Sampling.deterministicSample(Tables.documents(s, dir), "doc_id", 20)
      .select(col("doc_id"), col("lang"))
      .orderBy(col("doc_id"))
  }

  /** Train/test split sizes per language (90/10 by key hash). */
  val q45 = GQuery("q45_train_test_split",
    s"""SELECT lang,
       |  CASE WHEN $bkt < 10 THEN 'test' ELSE 'train' END AS split,
       |  count(*) AS n_docs
       |FROM documents
       |GROUP BY lang, split
       |ORDER BY lang, split""".stripMargin) { (s, dir) =>
    Sampling.trainTestSplit(Tables.documents(s, dir), "doc_id", 10)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"), col("split"))
  }

  /** Sequence packing into fixed token-budget shards via the two-phase
    * distributed prefix sum (see [[graft.operators.Packing]]); the
    * oracle recomputes it with DuckDB's sequential window — integer
    * token sums make the two bit-identical. */
  val q49 = {
    val MaxTok = 4096L
    GQuery("q49_pack_shards",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, n_tokens,
         |    ${Packing.shardIdSql("doc_id", "n_tokens", MaxTok)} AS shard_id
         |  FROM toks)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / $MaxTok, 4) AS fill_ratio
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val packed = Packing.packByTokenBudget(toks, "doc_id", "n_tokens", MaxTok)
      Packing.shardSummary(packed, "n_tokens", MaxTok)
        .orderBy(col("shard_id"))
    }
  }

  /** Weighted training mixture: per-language keep rates applied through
    * the same deterministic hash buckets (en 80%, de 40%, rest 10%). */
  val q50 = GQuery("q50_mixture_sample",
    s"""SELECT lang, count(*) AS n_docs
       |FROM documents
       |WHERE $bkt < CASE lang WHEN 'en' THEN 80 WHEN 'de' THEN 40 ELSE 10 END
       |GROUP BY lang ORDER BY lang""".stripMargin) { (s, dir) =>
    Sampling.stratifiedSample(Tables.documents(s, dir), "doc_id", "lang",
        Map("en" -> 80, "de" -> 40), defaultPct = 10)
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
      .orderBy(col("lang"))
  }

  /** Deterministic k-per-group sample: the md5-ordered first 20 docs of
    * every language — RNG-free group-wise subsampling (the per-stratum
    * counterpart of q50's rate-based mixture). */
  val q57 = GQuery("q57_group_sample",
    """SELECT doc_id, lang, CAST(rn AS INTEGER) AS rn FROM (
      |  SELECT doc_id, lang,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      |  FROM documents)
      |WHERE rn <= 20
      |ORDER BY lang, doc_id""".stripMargin) { (s, dir) =>
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("lang"))
      .orderBy(md5(col("doc_id").cast("string")), col("doc_id"))
    Tables.documents(s, dir)
      .select(col("doc_id"), col("lang"), row_number().over(w).as("rn"))
      .where(col("rn") <= 20)
      .orderBy(col("lang"), col("doc_id"))
  }

  /** Capstone: the composed curation pipeline every piece above serves —
    * near-dup clustering (keep one doc per cluster), exact-substring
    * decontamination against the stand-in benchmark slice, then
    * token-budget packing of the survivors into training shards. One
    * oracle assembles the proven q51/q53/q49 SQL and hash-checks the
    * whole composition end-to-end. */
  val q63 = {
    val MaxTok = 4096L
    GQuery("q63_curation_pipeline",
      s"""WITH RECURSIVE tok AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM documents),
         |sh AS (
         |  SELECT doc_id, list_distinct(
         |    [ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2] for i in range(1, len(ws) - 1)]) AS shset
         |  FROM tok WHERE len(ws) >= 3),
         |ex AS (SELECT doc_id, unnest(shset) AS s FROM sh),
         |sz AS (SELECT doc_id, len(shset) AS sz FROM sh),
         |shared AS (
         |  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS inter
         |  FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id < b.doc_id
         |  GROUP BY 1, 2),
         |pairs AS (
         |  SELECT id_a, id_b FROM shared
         |  JOIN sz sa ON sa.doc_id = id_a
         |  JOIN sz sb ON sb.doc_id = id_b
         |  WHERE inter * 1.0 / (sa.sz + sb.sz - inter) >= 0.8),
         |edges AS (
         |  SELECT id_a AS src, id_b AS dst FROM pairs
         |  UNION ALL SELECT id_b, id_a FROM pairs),
         |reach(id, rep) AS (
         |  SELECT doc_id, doc_id FROM documents
         |  UNION
         |  SELECT e.src, r.rep FROM edges e JOIN reach r ON e.dst = r.id),
         |clus AS (SELECT id AS doc_id, min(rep) AS cluster_rep FROM reach GROUP BY id),
         |probes AS (
         |  SELECT substr(text, 1, 64) AS probe FROM documents WHERE doc_id % 97 = 0),
         |kept AS (
         |  SELECT d.doc_id,
         |    CAST(len(list_filter(string_split(d.text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents d JOIN clus ON clus.doc_id = d.doc_id
         |  WHERE clus.cluster_rep = d.doc_id
         |    AND NOT EXISTS (SELECT 1 FROM probes p WHERE contains(d.text, p.probe))),
         |packed AS (
         |  SELECT doc_id, n_tokens,
         |    ${Packing.shardIdSql("doc_id", "n_tokens", MaxTok)} AS shard_id
         |  FROM kept)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / $MaxTok, 4) AS fill_ratio
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Packing}
      val docs = Tables.documents(s, dir)
      // same materialized cluster map as q51 (memoized per session —
      // the capstone composes the pipeline's artifacts, not recomputes)
      val clusters = DedupQueries.sharedClusters(s, dir)
      val probes = docs.where(col("doc_id") % 97 === 0)
        .select(substring(col("text"), 1, 64).as("probe"))
      val contam = Dedup.substringContamination(docs, "doc_id", "text", probes, "probe")
      val kept = docs.join(clusters, "doc_id").join(contam, "doc_id")
        .where(col("cluster_rep") === col("doc_id") && !col("contaminated"))
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      val packed = Packing.packByTokenBudget(kept, "doc_id", "n_tokens", MaxTok)
      Packing.shardSummary(packed, "n_tokens", MaxTok)
        .orderBy(col("shard_id"))
    }
  }

  /** Packing with intra-document splitting (see
    * [[graft.operators.Packing.packWithSplitting]]): the token stream
    * cut exactly every 4096, straddling docs split across shards —
    * every shard's token sum is exactly 4096 except the last. The
    * oracle recomputes the sequential prefix sum and the per-doc shard
    * range with integer arithmetic. */
  val q64 = {
    val B = 4096L
    GQuery("q64_pack_split",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens
         |  FROM documents),
         |st AS (
         |  SELECT doc_id, n_tokens,
         |    CAST(sum(n_tokens) OVER (ORDER BY md5(CAST(doc_id AS VARCHAR))
         |      ROWS UNBOUNDED PRECEDING) - n_tokens AS BIGINT) AS start
         |  FROM toks),
         |sp AS (
         |  SELECT doc_id, n_tokens, start,
         |    unnest([s for s in range(start // $B, (start + n_tokens - 1) // $B + 1)]) AS shard_id
         |  FROM st WHERE n_tokens > 0)
         |SELECT shard_id, count(*) AS n_segments,
         |  CAST(sum(least(start + n_tokens, (shard_id + 1) * $B) -
         |           greatest(start, shard_id * $B)) AS BIGINT) AS sum_tokens
         |FROM sp GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
      Packing.packWithSplitting(toks, "doc_id", "n_tokens", B)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_segments"),
          sum(col("tokens_in_shard")).as("sum_tokens"))
        .orderBy(col("shard_id"))
    }
  }

  /** Temperature (α=0.5) mixture reweighting by source (see
    * [[graft.operators.Sampling.temperatureSample]]): per-source keep
    * rates derived from the corpus counts themselves (two-pass), rows
    * kept through the deterministic hash buckets. */
  val q65 = GQuery("q65_temperature_mixture",
    """WITH cnt AS (SELECT source, count(*) AS n FROM documents GROUP BY source),
      |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
      |tot AS (SELECT sum(n) AS tot, sum(w) AS wsum FROM w),
      |rates AS (
      |  SELECT source,
      |    round(least(1.0, 0.5 * tot * (w / wsum) / n), 4) * 10000 AS thr
      |  FROM w, tot),
      |kept AS (
      |  SELECT d.source FROM documents d JOIN rates USING (source)
      |  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10000) < thr)
      |SELECT source, count(*) AS n_kept FROM kept
      |GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    Sampling.temperatureSample(Tables.documents(s, dir), "doc_id", "source",
        targetFraction = 0.5)
      .groupBy(col("source")).agg(count(lit(1)).as("n_kept"))
      .orderBy(col("source"))
  }

  /** Quality-ordered selection under a 15k-token budget (see
    * [[graft.operators.Sampling.tokenBudgetSelect]]): score with the
    * q28 quality formula, keep the best-first maximal prefix. The
    * oracle's sequential window equals the engine's two-phase prefix
    * sum exactly (integer token counts). */
  val q70 = GQuery("q70_token_budget",
    s"""WITH ${TextQueries.qualityCte},
       |r AS (
       |  SELECT doc_id, n_tokens, quality,
       |    CAST(sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
       |  FROM q)
       |SELECT doc_id, n_tokens, quality, cum_tokens
       |FROM r WHERE cum_tokens <= 15000
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val scored = Tables.documents(s, dir).select(col("doc_id"),
      TextFunctions.tokenCount(col("text")).as("n_tokens"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    Sampling.tokenBudgetSelect(scored, "doc_id", "n_tokens", "quality",
        budget = 15000)
      .select(col("doc_id"), col("n_tokens"), col("quality"),
        col("cum_tokens"))
      .orderBy(col("doc_id"))
  }

  /** Epoch-based mixture replication (see
    * [[graft.operators.Sampling.epochMixture]]): 2.4 epochs of src0,
    * 1.5 of src1, 0.5 of src2, 0.25 of src3, 1.0 elsewhere. The oracle
    * replays the same integer thresholds with a lateral range unnest. */
  val q75 = {
    val epochs = Seq("src0" -> 2.4, "src1" -> 1.5, "src2" -> 0.5,
      "src3" -> 0.25)
    val default = 1.0
    val buckets = 10000
    def caseSql(f: Double => Int): String =
      epochs.map { case (s, e) => s"WHEN '$s' THEN ${f(e)}" }
        .mkString("CASE source ", " ", s" ELSE ${f(default)} END")
    val nreps = caseSql(e => math.ceil(e).toInt)
    val fullreps = caseSql(e => math.floor(e).toInt)
    val thr = caseSql(e => math.round((e - math.floor(e)) * buckets).toInt)
    GQuery("q75_epoch_mixture",
      s"""WITH p AS (
         |  SELECT doc_id, source, $nreps AS nreps, $fullreps AS fullreps,
         |    $thr AS thr
         |  FROM documents)
         |SELECT doc_id, source, t.rep AS rep
         |FROM p, LATERAL UNNEST(range(0, p.nreps)) AS t(rep)
         |WHERE t.rep < fullreps OR ${Sampling.hashBucketSql("doc_id", buckets)} < thr
         |ORDER BY doc_id, rep""".stripMargin) { (s, dir) =>
      Sampling.epochMixture(Tables.documents(s, dir), "doc_id", "source",
          epochs.toMap, default, buckets)
        .select(col("doc_id"), col("source"), col("rep"))
        .orderBy(col("doc_id"), col("rep"))
    }
  }

  /** Capstone v2 — the ROUND-4 curation stack composed end-to-end:
    * quality cascade (first-failing-rule keep) → corpus-level span
    * dedup (rebuild docs from first-occurrence 5-word chunks) →
    * token-budget selection of the best-quality survivors → packing
    * into training shards. One oracle assembles the proven
    * q69/q68/q70/q49 SQL and hash-checks the whole composition.
    * Chunk first-occurrence is encoded as min(doc_id·10⁶ + pos) — the
    * same lexicographic (id, pos) order as the engine's min(struct). */
  val q77 = {
    val MaxTok = 2048L
    val Budget = 15000L
    val C = 1000000L
    GQuery("q77_curation_v2",
      s"""WITH tok AS (
         |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
         |  FROM documents),
         |base AS (
         |  SELECT doc_id, CAST(len(ws) AS BIGINT) AS n_tokens,
         |    round(CAST(len(list_distinct(ws)) AS DOUBLE) / len(ws), 4) AS frac_distinct
         |  FROM tok WHERE len(ws) >= 1),
         |big AS (
         |  SELECT doc_id,
         |    unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]) AS g
         |  FROM tok WHERE len(ws) >= 2),
         |cnt AS (SELECT doc_id, g, count(*) AS c FROM big GROUP BY 1, 2),
         |tb AS (
         |  SELECT doc_id,
         |    round(CAST(max(c) AS DOUBLE) / CAST(sum(c) AS DOUBLE), 4) AS top_bigram_frac
         |  FROM cnt GROUP BY doc_id),
         |keepdocs AS (
         |  SELECT b.doc_id FROM base b LEFT JOIN tb USING (doc_id)
         |  WHERE b.n_tokens >= 15 AND b.frac_distinct >= 0.35
         |    AND coalesce(tb.top_bigram_frac, 0.0) <= 0.1),
         |ch AS (
         |  SELECT t.doc_id, u.pos AS pos, u.s AS s FROM (
         |    SELECT doc_id,
         |      unnest([{'pos': j, 's': array_to_string(ws[(j*5+1):(j*5+5)], ' ')}
         |              for j in range(0, len(ws) // 5)]) AS u
         |    FROM tok JOIN keepdocs USING (doc_id) WHERE len(ws) >= 5) t(doc_id, u)),
         |firsts AS (SELECT s, min(doc_id * $C + pos) AS fk FROM ch GROUP BY s),
         |dd AS (
         |  SELECT doc_id, count(*) AS n_kept_chunks
         |  FROM ch JOIN firsts ON ch.s = firsts.s AND ch.doc_id * $C + ch.pos = firsts.fk
         |  GROUP BY doc_id),
         |q AS (
         |  SELECT d.doc_id,
         |    round((
         |      (CASE WHEN d.n_chars BETWEEN 100 AND 5000 THEN 1.0
         |            WHEN d.n_chars < 100 THEN d.n_chars / 100.0
         |            ELSE 5000.0 / d.n_chars END) +
         |      least(CASE WHEN len(t.ws) > 0
         |        THEN len(list_filter(t.ws, x -> list_contains(${TextQueries.stopListSql}, x))) * 1.0 / len(t.ws)
         |        ELSE 0.0 END * 5.0, 1.0) +
         |      (CASE WHEN len(t.ws) > 0 AND length(d.text) * 1.0 / len(t.ws) BETWEEN 3.0 AND 10.0
         |            THEN 1.0 ELSE 0.5 END)) / 3.0, 4) AS quality
         |  FROM documents d JOIN tok t USING (doc_id)),
         |scored AS (
         |  SELECT dd.doc_id, CAST(dd.n_kept_chunks * 5 AS BIGINT) AS n_toks, q.quality
         |  FROM dd JOIN q USING (doc_id)),
         |sel AS (
         |  SELECT doc_id, n_toks, quality FROM (
         |    SELECT *, sum(n_toks) OVER (ORDER BY quality DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) AS cum
         |    FROM scored) WHERE cum <= $Budget),
         |packed AS (
         |  SELECT doc_id, n_toks,
         |    ${Packing.shardIdSql("doc_id", "n_toks", MaxTok)} AS shard_id
         |  FROM sel)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_toks) AS BIGINT) AS sum_tokens,
         |  round(CAST(sum(n_toks) AS DOUBLE) / $MaxTok, 4) AS fill_ratio
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Packing, TextStats}
      val docs = Tables.documents(s, dir)
      val toks = TextQueries.sharedToks(s, dir)
      val kept = TextStats.qualityCascadeFromTokens(toks,
          minTokens = 15, maxTokens = 100000,
          minFracDistinct = 0.35, maxTopBigramFrac = 0.1)
        .where(col("keep")).select(col("id").as("doc_id"))
      val dd = Dedup.chunkDedupFromTokens(
        toks.join(kept.withColumnRenamed("doc_id", "id"), "id"), w = 5)
      // Materialized before the selection sort: tokenBudgetSelect's
      // range partitioner SAMPLES its child, which would re-execute the
      // whole cascade→span-dedup→join chain a second time per run; the
      // scored frame is three narrow columns per surviving doc — tiny
      // relative to the corpus — and a real pipeline writes exactly this
      // table before a global sort. Plan-identity caching dedups the
      // bench's repeated materializations.
      val scored = dd.select(col("id").as("doc_id"),
          (col("n_kept_chunks") * 5).cast("long").as("n_toks"))
        .join(docs.select(col("doc_id"),
          TextFunctions.qualityScore(col("text"), col("n_chars"))
            .as("quality")), "doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sel = Sampling.tokenBudgetSelect(scored, "doc_id", "n_toks",
          "quality", budget = Budget)
        .drop("cum_tokens")
      val packed = Packing.packByTokenBudget(sel, "doc_id", "n_toks", MaxTok)
      Packing.shardSummary(packed, "n_toks", MaxTok)
        .orderBy(col("shard_id"))
    }
  }

  /** DSIR importance weights (see
    * [[graft.operators.Sampling.dsirWeights]]): hashed-bigram
    * log-likelihood ratio of the `source = 'src0'` target slice vs the
    * raw corpus, 4096 buckets. The oracle replays the identical
    * featurize → smoothed-ratio → per-doc sum pipeline. */
  val q80 = GQuery("q80_dsir_weights",
    """WITH big AS (
      |  SELECT doc_id, source,
      |    unnest([ws[i] || ' ' || ws[i + 1] for i in range(1, len(ws))]) AS g
      |  FROM (SELECT doc_id, source,
      |          list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |        FROM documents)
      |  WHERE len(ws) >= 2),
      |feat AS (
      |  SELECT doc_id,
      |    (('0x' || substr(md5(g), 1, 12))::BIGINT % 4096) AS b,
      |    CASE WHEN source = 'src0' THEN 1 ELSE 0 END AS t
      |  FROM big),
      |cen AS (
      |  SELECT b, CAST(sum(t) AS BIGINT) AS ct, count(*) AS cr
      |  FROM feat GROUP BY b),
      |tot AS (
      |  SELECT CAST(sum(ct) AS BIGINT) AS nt, CAST(sum(cr) AS BIGINT) AS nr
      |  FROM cen),
      |lw AS (
      |  SELECT b, CAST(round((ln((ct + 1.0) / (nt + 4096))
      |    - ln((cr + 1.0) / (nr + 4096))) * 10000) AS BIGINT) AS wq
      |  FROM cen CROSS JOIN tot),
      |agg AS (
      |  SELECT doc_id, count(*) AS n_feats,
      |    round(sum(wq) / 10000.0, 4) AS w0
      |  FROM feat JOIN lw USING (b)
      |  GROUP BY doc_id)
      |SELECT doc_id, n_feats,
      |  CASE WHEN w0 = 0 THEN 0.0 ELSE w0 END AS dsir_logweight
      |FROM agg ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val flags = Tables.documents(s, dir).select(col("doc_id").as("id"),
      (col("source") === "src0").as("__t"))
    Sampling.dsirWeightsFromTokens(
        TextQueries.sharedToks(s, dir)
          .join(broadcast(flags), "id")
          .select(col("id"), col("__t"), col("ws")),
        buckets = 4096)
      .withColumnRenamed("id", "doc_id")
      .orderBy(col("doc_id"))
  }

  /** Token-weighted temperature mixture (see
    * [[graft.operators.Sampling.temperatureSampleByTokens]]): strata
    * sized by token sums, not row counts — the budget pretraining
    * mixtures actually schedule. Reports kept docs AND kept tokens per
    * source. */
  val q87 = GQuery("q87_token_mixture",
    """WITH tk AS (
      |  SELECT doc_id, source,
      |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT)
      |      AS n_tokens
      |  FROM documents),
      |cnt AS (SELECT source, CAST(sum(n_tokens) AS BIGINT) AS n FROM tk GROUP BY source),
      |w AS (SELECT source, n, sqrt(CAST(n AS DOUBLE)) AS w FROM cnt),
      |tot AS (SELECT CAST(sum(n) AS BIGINT) AS tot, sum(w) AS wsum FROM w),
      |rates AS (
      |  SELECT source,
      |    round(least(1.0, 0.5 * tot * (w / wsum) / n), 4) * 10000 AS thr
      |  FROM w, tot),
      |kept AS (
      |  SELECT t.source, t.n_tokens FROM tk t JOIN rates USING (source)
      |  WHERE (('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 4))::INT % 10000) < thr)
      |SELECT source, count(*) AS n_kept,
      |  CAST(sum(n_tokens) AS BIGINT) AS kept_tokens
      |FROM kept GROUP BY source ORDER BY source""".stripMargin) { (s, dir) =>
    val tk = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"))
    Sampling.temperatureSampleByTokens(tk, "doc_id", "source", "n_tokens",
        targetFraction = 0.5)
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_kept"), sum(col("n_tokens")).as("kept_tokens"))
      .orderBy(col("source"))
  }

  /** Capstone v3 — model-in-the-loop curation: the q89 classifier's
    * keep-probability (not the heuristic score) prioritizes the
    * token-budget selection, then shards are packed. Rows-only (the
    * MLlib stage has no SQL oracle); `CurationV3Spec` asserts the
    * budget/packing laws and that selection follows the model's
    * ordering. */
  val q92 = GQuery.rowsOnly("q92_curation_v3") { (s, dir) =>
    val Budget = 100000L
    val MaxTok = 2048L
    // persisted: tokenBudgetSelect's range sampling re-executes its
    // child once per materialization — the scored frame is 4 narrow
    // columns per kept doc (same move as q77's scored table)
    val scored = TextQueries.q89.run(s, dir)
      .join(Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_toks")),
        "doc_id")
      .where(col("pred_keep"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val sel = Sampling.tokenBudgetSelect(scored, "doc_id", "n_toks",
      "prob_keep", budget = Budget)
    val packed = Packing.packByTokenBudget(
      sel.drop("cum_tokens"), "doc_id", "n_toks", MaxTok)
    Packing.shardSummary(packed, "n_toks", MaxTok)
      .orderBy(col("shard_id"))
  }

  /** Quality-weighted Bernoulli subsample (see
    * [[graft.operators.Sampling.weightedBernoulliSample]]): keep docs
    * with probability ∝ the q28 quality score, expected fraction 1/2 —
    * the resampling half of importance weighting. The acceptance test
    * is pure integer arithmetic (decimal(38,0) / HUGEINT), so the
    * kept flags hash-match with no float anywhere. */
  val q102 = GQuery("q102_weighted_sample",
    s"""WITH ${TextQueries.qualityCte},
       |w AS (
       |  SELECT doc_id,
       |    greatest(CAST(round(quality * 1e4) AS BIGINT), 0) AS w4,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS u48
       |  FROM q),
       |tw AS (SELECT sum(w4) AS sw4, count(*) AS n FROM w)
       |SELECT doc_id, w4,
       |  (CAST(u48 AS HUGEINT) * CAST(sw4 AS HUGEINT) * 2) <
       |    (CAST(w4 AS HUGEINT) * CAST(n AS HUGEINT) * 1 *
       |     CAST(281474976710656 AS HUGEINT)) AS kept
       |FROM w, tw
       |ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val weighted = Tables.documents(s, dir).select(col("doc_id"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    Sampling.weightedBernoulliSample(weighted, "doc_id", "quality",
        fracNum = 1, fracDen = 2)
      .orderBy(col("doc_id"))
  }

  /** Curriculum shards (see [[graft.operators.Packing.packByOrder]]):
    * the corpus packed in quality-DESCENDING order, so shard 0 is the
    * best data and a loader reading shards in sequence sees the
    * curriculum. Per-shard summary carries the exact 1e-4 fixed-point
    * quality sum (order-free integer) instead of a float average, so
    * the whole row hash-matches. */
  val q106 = {
    val MaxTok = 4096L
    GQuery("q106_curriculum_shards",
      s"""WITH ${TextQueries.qualityCte},
         |packed AS (
         |  SELECT doc_id, n_tokens, quality,
         |    CAST(floor((sum(n_tokens) OVER (ORDER BY quality DESC, doc_id
         |      ROWS UNBOUNDED PRECEDING) - n_tokens) / $MaxTok) AS BIGINT)
         |      AS shard_id
         |  FROM q)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  CAST(sum(CAST(round(quality * 1e4) AS BIGINT)) AS BIGINT) AS q4_sum,
         |  round(CAST(sum(n_tokens) AS DOUBLE) / $MaxTok, 4) AS fill_ratio
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val docs = Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
      Packing.packByOrder(docs, "doc_id", "n_tokens", "quality", MaxTok)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_tokens")).as("sum_tokens"),
          sum(round(col("quality") * 1e4).cast("long")).as("q4_sum"))
        .withColumn("fill_ratio",
          round(col("sum_tokens").cast("double") / MaxTok, 4))
        .orderBy(col("shard_id"))
    }
  }

  /** Weighted k-sample without replacement (see
    * [[graft.operators.Sampling.weightedTopKSample]]): the 50 docs
    * drawn quality-proportionally by the A-ES key, exact rank order.
    * The oracle replays the md5 coin, the grid-snapped ln key, and the
    * (key, id) ranking verbatim. */
  val q142 = GQuery("q142_weighted_topk_sample",
    s"""WITH ${TextQueries.qualityCte},
       |w AS (
       |  SELECT doc_id,
       |    greatest(CAST(round(quality * 1e4) AS BIGINT), 0) AS w4,
       |    ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12))::BIGINT AS u48
       |  FROM q),
       |ks AS (
       |  SELECT doc_id, w4,
       |    CAST(round(1e10 * ln(281474976710656.0 / (u48 + 1)) / w4) AS BIGINT)
       |      AS key10
       |  FROM w WHERE w4 > 0),
       |top AS (
       |  SELECT doc_id, w4, key10,
       |    CAST(row_number() OVER (ORDER BY key10, doc_id) AS INT) AS rn
       |  FROM ks)
       |SELECT doc_id, w4, key10, rn FROM top WHERE rn <= 50
       |ORDER BY rn""".stripMargin) { (s, dir) =>
    val weighted = Tables.documents(s, dir).select(col("doc_id"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    Sampling.weightedTopKSample(weighted, "doc_id", "quality", k = 50)
      .orderBy(col("rn"))
  }

  /** Shard manifest with integrity hashes (see
    * [[graft.operators.Packing.shardManifest]]): the q49 shards with
    * membership and content hashes — the reproducibility artifact a
    * training export records; the oracle replays the shard assignment
    * AND both ordered-aggregate hashes. */
  val q144 = {
    val MaxTok = 4096L
    GQuery("q144_shard_manifest",
      s"""WITH toks AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> '')) AS BIGINT) AS n_tokens,
         |    md5(regexp_replace(lower(trim(text)), '\\s+', ' ', 'g')) AS fp
         |  FROM documents),
         |packed AS (
         |  SELECT doc_id, n_tokens, fp,
         |    ${Packing.shardIdSql("doc_id", "n_tokens", MaxTok)} AS shard_id
         |  FROM toks)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), '-' ORDER BY doc_id)) AS ids_hash,
         |  md5(string_agg(fp, '' ORDER BY doc_id)) AS content_hash
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      val toks = Tables.documents(s, dir)
        .select(col("doc_id"),
          TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
          TextFunctions.fingerprint(col("text")).as("fp"))
      val packed = Packing.packByTokenBudget(toks, "doc_id", "n_tokens", MaxTok)
      Packing.shardManifest(packed, "doc_id", "n_tokens", "fp")
        .orderBy(col("shard_id"))
    }
  }

  /** Capstone curation v9 — the INCREMENTAL-refresh pipeline end to
    * end: snapshot diff (q134) drives a selective quality recompute
    * (q137), the refreshed scores gate keeps, survivors pack into
    * token-budget shards (q49), and each shard exports with integrity
    * hashes plus a count of recomputed members (q144) — the artifact
    * chain a recurring 100 TB curation run produces per crawl, with
    * per-run compute O(churn) + the pack. One oracle replays the diff
    * verdicts closed-form, the full quality formula over v2, the shard
    * assignment, and both ordered-aggregate hashes. */
  val q147 = {
    val MaxTok = 4096L
    val QBar = 0.5
    GQuery("q147_curation_v9",
      s"""WITH v2 AS (
         |  SELECT doc_id,
         |    CASE WHEN doc_id % 11 = 0 THEN text || ' rev2' ELSE text END AS text,
         |    CASE WHEN doc_id % 11 = 0 THEN n_chars + 5 ELSE n_chars END AS n_chars
         |  FROM documents WHERE doc_id % 5 <> 0),
         |${TextQueries.qualityCtesOver("v2")},
         |scored AS (
         |  SELECT q.doc_id, CAST(q.n_tokens AS BIGINT) AS n_tokens, q.quality,
         |    (q.doc_id % 7 = 0 OR q.doc_id % 11 = 0) AS recomputed,
         |    md5(regexp_replace(lower(trim(v2.text)), '\\s+', ' ', 'g')) AS fp
         |  FROM q JOIN v2 USING (doc_id)),
         |kept AS (SELECT * FROM scored WHERE quality >= $QBar),
         |packed AS (
         |  SELECT doc_id, n_tokens, fp, recomputed,
         |    ${Packing.shardIdSql("doc_id", "n_tokens", MaxTok)} AS shard_id
         |  FROM kept)
         |SELECT shard_id, count(*) AS n_docs,
         |  CAST(sum(CASE WHEN recomputed THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_recomputed,
         |  CAST(sum(n_tokens) AS BIGINT) AS sum_tokens,
         |  md5(string_agg(CAST(doc_id AS VARCHAR), '-' ORDER BY doc_id)) AS ids_hash,
         |  md5(string_agg(fp, '' ORDER BY doc_id)) AS content_hash
         |FROM packed GROUP BY shard_id
         |ORDER BY shard_id""".stripMargin) { (s, dir) =>
      import graft.functions.TextFunctions
      val docs = Tables.documents(s, dir)
      val v1 = docs.where(col("doc_id") % 7 =!= 0)
      val v2 = docs.where(col("doc_id") % 5 =!= 0)
        .withColumn("n_chars", when(col("doc_id") % 11 === 0,
          col("n_chars") + 5).otherwise(col("n_chars")))
        .withColumn("text", when(col("doc_id") % 11 === 0,
          concat(col("text"), lit(" rev2"))).otherwise(col("text")))
      def score(df: org.apache.spark.sql.DataFrame) = df.select(col("doc_id"),
        TextFunctions.tokenCount(col("text")).cast("long").as("n_tokens"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"),
        TextFunctions.fingerprint(col("text")).as("fp"))
      // the refresh runs through the ENGINE's diff machinery; the
      // oracle recomputes everything over v2 — stale carry-forwards
      // or wrong verdicts surface as hash mismatches
      val refreshed = graft.operators.Dedup
        .incrementalRecompute(v1, score(v1), v2, "doc_id", "text")(score)
      val kept = refreshed.where(col("quality") >= QBar)
      val packed = Packing.packByTokenBudget(
        kept.select(col("doc_id"), col("n_tokens"), col("fp"),
          col("recomputed")),
        "doc_id", "n_tokens", MaxTok)
      packed.groupBy(col("shard_id"))
        .agg(count(lit(1)).as("n_docs"),
          sum(when(col("recomputed"), 1L).otherwise(0L)).as("n_recomputed"),
          sum(col("n_tokens")).as("sum_tokens"),
          md5(array_join(transform(sort_array(collect_list(col("doc_id"))),
            _.cast("string")), "-")).as("ids_hash"),
          md5(array_join(
            sort_array(collect_list(struct(col("doc_id"), col("fp"))))
              .getField("fp"), "")).as("content_hash"))
        .orderBy(col("shard_id"))
    }
  }

  /** Histogram-equalized range sharding (see
    * [[graft.operators.Sampling.rangeBuckets]]): 8 quality-ordered,
    * balanced-up-to-ties buckets derived from the grid-cell histogram —
    * no global sort, no sampled boundaries. The oracle replays the
    * cumulative-cell arithmetic; the report shows each bucket's
    * population and score range (ranges must not overlap — monotone by
    * construction). */
  val q149 = {
    val B = 8
    GQuery("q149_range_buckets",
      s"""WITH ${TextQueries.qualityCte},
         |rws AS (
         |  SELECT doc_id, CAST(round(quality * 1e4) AS BIGINT) AS s4 FROM q),
         |cells AS (SELECT s4, count(*) AS n_cell FROM rws GROUP BY s4),
         |tot AS (SELECT count(*) AS n_total FROM rws),
         |mapped AS (
         |  SELECT s4,
         |    CAST(floor(coalesce(sum(n_cell) OVER (ORDER BY s4
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      * $B / n_total) AS INT) AS bucket
         |  FROM cells, tot)
         |SELECT bucket, count(*) AS n_docs, min(s4) AS min_s4, max(s4) AS max_s4
         |FROM rws JOIN mapped USING (s4)
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      val quality = Tables.documents(s, dir).select(col("doc_id"),
        TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
      Sampling.rangeBuckets(quality, "doc_id", "quality", B)
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          min(col("s4")).as("min_s4"), max(col("s4")).as("max_s4"))
        .orderBy(col("bucket"))
    }
  }

  /** Per-source A-ES k-samples in one keyed-window pass (see
    * [[graft.operators.Sampling.weightedTopKSamplePerGroup]]) — the
    * grouped sibling of q142, same item-intrinsic keys. */
  val q154 = GQuery("q154_grouped_weighted_sample",
    s"""WITH ${TextQueries.qualityCte},
       |src AS (SELECT doc_id, source FROM documents),
       |w AS (
       |  SELECT q.doc_id, src.source,
       |    greatest(CAST(round(quality * 1e4) AS BIGINT), 0) AS w4,
       |    ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR)), 1, 12))::BIGINT AS u48
       |  FROM q JOIN src ON src.doc_id = q.doc_id),
       |ks AS (
       |  SELECT doc_id, source, w4,
       |    CAST(round(1e10 * ln(281474976710656.0 / (u48 + 1)) / w4) AS BIGINT)
       |      AS key10
       |  FROM w WHERE w4 > 0),
       |top AS (
       |  SELECT source, doc_id, w4, key10,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY key10, doc_id) AS INT) AS rn
       |  FROM ks)
       |SELECT source, doc_id, w4, key10, rn FROM top WHERE rn <= 4
       |ORDER BY source, rn""".stripMargin) { (s, dir) =>
    val weighted = Tables.documents(s, dir).select(col("doc_id"), col("source"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    Sampling.weightedTopKSamplePerGroup(weighted, "doc_id", "quality",
        "source", k = 4)
      .orderBy(col("source"), col("rn"))
  }

  /** Capstone curation v10 — plagiarism-aware refresh to balanced
    * export: strip cross-doc shared spans (q153), RE-score quality on
    * the cleaned text, keep docs that stay ≥ half novel and clear the
    * quality bar, then range-shard the survivors into 8 balanced
    * quality buckets (q149's histogram boundaries — no global sort).
    * One oracle replays the whole chain; a stale span mask, a
    * pre-strip quality score, or a mis-derived boundary is a hash
    * mismatch. */
  val q155 = {
    val B = 8
    GQuery("q155_curation_v10",
      s"""WITH ${DedupQueries.spanCtes},
         |cleaned AS (
         |  SELECT r.doc_id, r.cleaned_text AS text,
         |    length(r.cleaned_text) AS n_chars
         |  FROM res r),
         |${TextQueries.qualityCtesOver("cleaned")},
         |keepr AS (
         |  SELECT q.doc_id, res.n_kept_tokens, q.quality
         |  FROM q JOIN res ON res.doc_id = q.doc_id
         |  JOIN tok ON tok.doc_id = q.doc_id
         |  WHERE res.n_kept_tokens * 2 >= len(tok.ws) AND q.quality >= 0.5),
         |rws AS (
         |  SELECT doc_id, n_kept_tokens,
         |    CAST(round(quality * 1e4) AS BIGINT) AS s4
         |  FROM keepr),
         |cells AS (SELECT s4, count(*) AS n_cell FROM rws GROUP BY s4),
         |tot AS (SELECT count(*) AS n_total FROM rws),
         |mapped AS (
         |  SELECT s4,
         |    CAST(floor(coalesce(sum(n_cell) OVER (ORDER BY s4
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      * $B / n_total) AS INT) AS bucket
         |  FROM cells, tot)
         |SELECT bucket, count(*) AS n_docs,
         |  CAST(sum(n_kept_tokens) AS BIGINT) AS sum_tokens,
         |  min(s4) AS min_s4, max(s4) AS max_s4
         |FROM rws JOIN mapped USING (s4)
         |GROUP BY bucket ORDER BY bucket""".stripMargin) { (s, dir) =>
      import graft.operators.{Dedup, Sampling}
      val stripped = Dedup
        .stripSharedSpans(TextQueries.sharedToks(s, dir), w = 5, minLen = 8)
        .where(col("n_kept_tokens") > 0)
      val scored = stripped.select(col("id"), col("n_tokens"),
        col("n_kept_tokens"),
        TextFunctions.qualityScore(col("cleaned_text"),
          length(col("cleaned_text"))).as("quality"))
      val kept = scored
        .where(col("n_kept_tokens") * 2 >= col("n_tokens")
          && col("quality") >= 0.5)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      Sampling.rangeBuckets(kept, "id", "quality", B)
        .join(kept.select(col("id"), col("n_kept_tokens")), "id")
        .groupBy("bucket")
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_kept_tokens")).as("sum_tokens"),
          min(col("s4")).as("min_s4"), max(col("s4")).as("max_s4"))
        .orderBy(col("bucket"))
    }
  }

  /** Mixture waterfilling plan (see
    * [[graft.operators.Sampling.mixtureWaterfill]]): allocate half the
    * corpus's tokens across sources proportionally to target weights
    * (src_i → weight i+1), with saturation and surplus redistribution
    * solved exactly. The oracle replays the sort, the prefix
    * feasibility scan, and the integer allocations in HUGEINT. */
  val q165 = GQuery("q165_mixture_waterfill",
    """WITH agg AS (
      |  SELECT source AS src,
      |    CAST(sum(len(list_filter(string_split(text, ' '), x -> x <> '')))
      |      AS BIGINT) AS tokens,
      |    CAST(substr(source, 4) AS BIGINT) + 1 AS tgt
      |  FROM documents GROUP BY source),
      |bud AS (SELECT CAST(sum(tokens) // 2 AS BIGINT) AS b FROM agg),
      |ord AS (
      |  SELECT *, row_number() OVER (ORDER BY tokens * 1.0 / tgt, src) AS rk
      |  FROM agg),
      |cum AS (
      |  SELECT ord.*,
      |    sum(tokens) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS ctok,
      |    sum(tgt) OVER (ORDER BY rk ROWS UNBOUNDED PRECEDING) AS ctgt
      |  FROM ord),
      |tots AS (
      |  SELECT CAST(sum(tgt) AS HUGEINT) AS ttgt, count(*) AS s FROM agg),
      |pref AS (
      |  SELECT rk AS k, CAST(ctok AS HUGEINT) AS ctok,
      |    CAST(ctgt AS HUGEINT) AS ctgt FROM cum
      |  UNION ALL SELECT 0, 0, 0),
      |feas AS (
      |  SELECT p.k FROM pref p, tots, bud
      |  WHERE (p.k = 0 OR EXISTS (
      |      SELECT 1 FROM cum c WHERE c.rk = p.k
      |        AND CAST(c.tokens AS HUGEINT) * (tots.ttgt - p.ctgt)
      |            <= (bud.b - p.ctok) * c.tgt))
      |    AND (p.k = tots.s OR EXISTS (
      |      SELECT 1 FROM cum c WHERE c.rk = p.k + 1
      |        AND CAST(c.tokens AS HUGEINT) * (tots.ttgt - p.ctgt)
      |            > (bud.b - p.ctok) * c.tgt))),
      |ks AS (SELECT coalesce(min(k), (SELECT s FROM tots)) AS k FROM feas),
      |kp AS (SELECT p.* FROM pref p JOIN ks ON p.k = ks.k),
      |res AS (
      |  SELECT c.src, c.tokens, c.tgt, c.rk <= kp.k AS saturated,
      |    CAST(CASE WHEN c.rk <= kp.k THEN CAST(c.tokens AS HUGEINT)
      |         WHEN tots.ttgt - kp.ctgt = 0 THEN 0
      |         ELSE ((bud.b - kp.ctok) * c.tgt) // (tots.ttgt - kp.ctgt)
      |         END AS BIGINT) AS allocated
      |  FROM cum c, kp, tots, bud)
      |SELECT src AS source, tokens, tgt, allocated, saturated,
      |  CAST(CASE WHEN tokens = 0 THEN 0
      |       ELSE (CAST(allocated AS HUGEINT) * 10000) // tokens
      |       END AS BIGINT) AS rate4
      |FROM res ORDER BY source""".stripMargin) { (s, dir) =>
    val perSource = Tables.documents(s, dir)
      .groupBy(col("source").as("src"))
      .agg(sum(TextFunctions.tokenCount(col("text")).cast("long")).as("tokens"))
      .withColumn("tgt",
        regexp_extract(col("src"), "src(\\d+)", 1).cast("long") + 1)
    val total = perSource.agg(sum(col("tokens"))).head().getLong(0)
    Sampling.mixtureWaterfill(perSource, total / 2).orderBy(col("source"))
  }

  /** Neyman-optimal stratified allocation (see
    * [[graft.operators.Sampling.neymanAllocation]]): a 1000-row sample
    * budget split across order priorities ∝ N_h·σ_h of the order value
    * — exact integer weights, Hamilton largest-remainder seats, so the
    * oracle replays the apportionment seat by seat and Σalloc = 1000
    * is a hash-checked invariant. */
  val q233 = GQuery("q233_neyman_allocation",
    """WITH s AS (
      |  SELECT o_orderpriority AS stratum, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(CAST(round(1e4 * o_totalprice) AS BIGINT)) AS BIGINT)
      |      AS sv,
      |    sum(CAST(round(1e4 * o_totalprice) AS HUGEINT)
      |      * CAST(round(1e4 * o_totalprice) AS BIGINT)) AS svv
      |  FROM orders WHERE o_totalprice IS NOT NULL GROUP BY 1),
      |w_ AS (
      |  SELECT stratum, n,
      |    CAST(round(sqrt(CAST(n * svv - CAST(sv AS HUGEINT) * sv
      |      AS DOUBLE))) AS BIGINT) AS w
      |  FROM s),
      |tot AS (SELECT CAST(sum(w) AS BIGINT) AS wt FROM w_),
      |b AS (
      |  SELECT stratum, n, w, wt,
      |    CASE WHEN wt > 0
      |      THEN CAST(((1000 * w) - (1000 * w) % wt) / wt AS BIGINT)
      |      ELSE 0 END AS base,
      |    CASE WHEN wt > 0 THEN (1000 * w) % wt ELSE 0 END AS rem
      |  FROM w_, tot),
      |lo AS (SELECT 1000 - CAST(sum(base) AS BIGINT) AS lo FROM b),
      |r AS (SELECT *, row_number() OVER (ORDER BY rem DESC, stratum) AS rn
      |  FROM b)
      |SELECT stratum, n AS n_rows, w,
      |  base + CASE WHEN rn <= lo THEN 1 ELSE 0 END AS alloc
      |FROM r, lo ORDER BY stratum""".stripMargin) { (s, dir) =>
    graft.operators.Sampling.neymanAllocation(
        Tables.orders(s, dir), "o_orderpriority", "o_totalprice", 1000L)
      .orderBy(col("stratum"))
  }

  /** Padding-waste census (see
    * [[graft.operators.Packing.paddingWasteReport]]): what a
    * fixed-64-row training loader pads under arrival-order batching
    * vs length-bucketed (longest-first) batching — the readout that
    * justifies a bucketing stage. Batch assignment is the two-phase
    * prefix-sum rank (never a single-partition window); the oracle
    * replays it with sequential row_number windows and the exact
    * `//`-grid waste share. */
  val q357 = {
    val B = 64
    GQuery("q357_padding_waste",
      s"""WITH tl AS (
         |  SELECT doc_id,
         |    CAST(len(list_filter(string_split(text, ' '), x -> x <> ''))
         |      AS BIGINT) AS ntok
         |  FROM documents),
         |lb AS (
         |  SELECT ntok,
         |    (row_number() OVER (ORDER BY ntok DESC, doc_id) - 1) // $B
         |      AS batch
         |  FROM tl),
         |ar AS (
         |  SELECT ntok,
         |    (row_number() OVER (ORDER BY doc_id) - 1) // $B AS batch
         |  FROM tl),
         |ab AS (
         |  SELECT 'arrival' AS strategy, batch, count(*) AS nb,
         |    max(ntok) AS mx, sum(ntok) AS st
         |  FROM ar GROUP BY 2
         |  UNION ALL
         |  SELECT 'length_bucketed', batch, count(*), max(ntok), sum(ntok)
         |  FROM lb GROUP BY 2)
         |SELECT strategy, CAST(sum(nb) AS BIGINT) AS n_docs,
         |  CAST(count(*) AS BIGINT) AS n_batches,
         |  CAST(sum(st) AS BIGINT) AS total_tokens,
         |  CAST(sum(nb * mx) AS BIGINT) AS padded_tokens,
         |  CAST((2 * 10000 * (sum(nb * mx) - sum(st)) + sum(nb * mx))
         |    // (2 * sum(nb * mx)) AS BIGINT) AS waste_share4
         |FROM ab GROUP BY strategy ORDER BY strategy""".stripMargin) {
      (s, dir) =>
      import graft.functions.TextFunctions
      graft.operators.Packing.paddingWasteReport(
          Tables.documents(s, dir).select(col("doc_id"),
            TextFunctions.tokenCount(col("text")).as("ntok")),
          "doc_id", "ntok", batchRows = B.toLong)
        .orderBy(col("strategy"))
    }
  }

  val all: Seq[GQuery] =
    Seq(q44, q45, q49, q50, q57, q63, q64, q65, q70, q75, q77, q80, q87, q92,
      q102, q106, q142, q144, q147, q149, q154, q155, q165, q233, q357)
}
