package graft.queries

import graft.Tables
import graft.functions.VectorFunctions
import graft.operators.Similarity
import org.apache.spark.sql.functions._

/** Similarity search over `embeddings` (array<float>, dim 64): exact
  * brute-force cosine top-k and the sign-LSH bucketed approximation.
  * The dot products are fully unrolled (same IEEE summation order in
  * Spark and DuckDB → bit-identical cosines).
  */
object SimilarityQueries {

  private val Dim = 64
  private val K = 5
  private val NQueries = 5   // query set: vec_id < 5
  private val Bits = 8

  private def cosSql = VectorFunctions.cosineSql("qv", "cv", Dim)

  val q31 = GQuery("q31_cosine_topk",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
       |  FROM q, c WHERE corpus_id <> query_id),
       |rk AS (
       |  SELECT query_id, corpus_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, corpus_id) AS INT) AS rn
       |  FROM scored)
       |SELECT query_id, corpus_id, cosine, rn FROM rk WHERE rn <= $K
       |ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
    sharedExact(s, dir).orderBy(col("query_id"), col("rn"))
  }.copy(headline = true)

  val q32 = {
    val qb = VectorFunctions.signBucketSql("qv", Bits)
    val cb = VectorFunctions.signBucketSql("cv", Bits)
    GQuery("q32_lsh_topk",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, $qb AS bucket
         |           FROM embeddings WHERE vec_id < $NQueries),
         |c AS (SELECT vec_id AS corpus_id, embedding AS cv, $cb AS bucket
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
         |  FROM q JOIN c USING (bucket) WHERE corpus_id <> query_id),
         |rk AS (
         |  SELECT query_id, corpus_id, cosine,
         |    CAST(row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id) AS INT) AS rn
         |  FROM scored)
         |SELECT query_id, corpus_id, cosine, rn FROM rk WHERE rn <= $K
         |ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.signLshTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < NQueries),
          idCol = "vec_id", vecCol = "embedding", k = K, dim = Dim, bits = Bits)
        .orderBy(col("query_id"), col("rn"))
    }.copy(headline = true)
  }

  /** q31 via the native codegen'd [[graft.plans.CosineSim]] expression —
    * same oracle as q31 (identical summation order), demonstrating the
    * custom-Expression rung and its fused single-loop plan. */
  val q31b = GQuery("q31b_cosine_topk_native",
    q31.oracle.get) { (s, dir) =>
    graft.plans.CosineSim.register(s)
    val emb = Tables.embeddings(s, dir)
    val c = emb.select(col("vec_id").as("corpus_id"), col("embedding").as("cv"))
    val q = emb.filter(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("embedding").as("qv"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("cosine").desc, col("corpus_id"))
    c.join(broadcast(q), col("corpus_id") =!= col("query_id"))
      .withColumn("cosine", round(call_function("cosine_sim", col("qv"), col("cv")), 6))
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= K)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
      .orderBy(col("query_id"), col("rn"))
  }

  /** Hard-negative mining (see
    * [[graft.operators.Similarity.hardNegatives]]): per query, top-k
    * most-similar vectors with a DIFFERENT label. */
  val q74 = GQuery("q74_hard_negatives",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label AS c_label
       |      FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
       |  FROM q, c WHERE c_label <> q_label),
       |rk AS (
       |  SELECT query_id, corpus_id, cosine,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, corpus_id) AS INT) AS rn
       |  FROM scored)
       |SELECT query_id, corpus_id, cosine, rn FROM rk WHERE rn <= $K
       |ORDER BY query_id, rn""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.hardNegatives(
        corpus = emb, queries = emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label", k = K)
      .orderBy(col("query_id"), col("rn"))
  }

  /** The trained IVF index — centroid matrix + persisted cid-assigned
    * corpus — shared by q32b (ANN probe) and q72 (SemDeDup). Trained
    * once per (session, dir) and memoized, exactly as a real pipeline
    * stores the index once and has every consumer read it back;
    * training is EAGER (Lloyd iterations collect), so plan-identity
    * caching cannot dedup repeated calls and memoization is the
    * session-local equivalent of the stored index. */
  private val ivfCache = new SessionCache[
    (Array[(Int, Array[Double])], org.apache.spark.sql.DataFrame)]

  /** Session-shared exact brute-force top-k pool `(query_id,
    * corpus_id, cosine, rn)` — q31's output and the ground-truth side
    * of every recall audit (q109, q140, q230): one identical
    * `bruteForceTopK(emb, vec_id < NQueries, k = K)` frame, computed
    * once per session (the round's localCheckpoint-leaf pattern). */
  private def sharedExact(s: org.apache.spark.sql.SparkSession,
                          dir: String): org.apache.spark.sql.DataFrame =
    Materialized(s, s"bruteExact:$dir") {
      val emb = Tables.embeddings(s, dir)
      Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding", k = K, dim = Dim)
    }

  private def sharedIvf(s: org.apache.spark.sql.SparkSession, dir: String)
      : (Array[(Int, Array[Double])], org.apache.spark.sql.DataFrame) =
    ivfCache.get(s, dir) {
        val cents = Similarity.ivfTrain(Tables.embeddings(s, dir),
          "vec_id", "embedding", nlist = 16, iters = 3)
        val assigned = Similarity.ivfAssign(Tables.embeddings(s, dir),
            "vec_id", "embedding", cents)
          .localCheckpoint(true)
        (cents, assigned)
      }

  /** IVF (learned k-means centroids) approximate top-k — the
    * clustered-data alternative to fixed sign-planes. Driver-green: the
    * training loop is deterministic BY CONSTRUCTION (md5-ordered
    * seeding, fixed iterations, 6-dp-rounded means), so the oracle
    * REPLAYS every Lloyd step as chained MATERIALIZED CTEs (the
    * q83/q62 idiom — see [[AnnOracles]]) and then the probe + top-k on
    * the replayed centroids. Recall floors stay in `LshRecallSpec`. */
  val q32b = GQuery("q32b_ivf_topk",
    AnnOracles.ivfTopKSql(dim = Dim, nlist = 16, iters = 3,
      nQueries = NQueries, nprobe = 4, k = K)) { (s, dir) =>
    val (cents, assigned) = sharedIvf(s, dir)
    val emb = Tables.embeddings(s, dir)
    Similarity.ivfProbe(assigned, cents,
        emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding", k = K, nprobe = 4)
      .orderBy(col("query_id"), col("rn"))
  }

  /** Per-label embedding stats (norm via the unrolled dot). */
  val q33 = GQuery("q33_embedding_stats",
    s"""SELECT label,
       |  count(*) AS n_vecs,
       |  round(avg(sqrt(${VectorFunctions.dotSql("embedding", "embedding", Dim)})), 4) AS avg_norm
       |FROM embeddings GROUP BY label ORDER BY label""".stripMargin) { (s, dir) =>
    Tables.embeddings(s, dir)
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(VectorFunctions.norm(col("embedding"))), 4)
          .as("avg_norm"))
      .orderBy(col("label"))
  }

  /** Deterministic symmetric int8 quantization of the embedding column
    * (see [[graft.operators.Embeddings.quantizeInt8]]) — integer
    * checksums make the float→int8 transform engine-exact. */
  val q55 = GQuery("q55_quantize_int8",
    """WITH mx AS (
      |  SELECT vec_id, embedding,
      |    list_max(list_transform(embedding, x -> abs(CAST(x AS DOUBLE)))) AS maxabs
      |  FROM embeddings),
      |sc AS (
      |  SELECT vec_id, embedding, maxabs,
      |    CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END AS scale
      |  FROM mx),
      |qv AS (
      |  SELECT vec_id, round(maxabs, 6) AS max_abs,
      |    list_transform(embedding,
      |      x -> CAST(floor(CAST(x AS DOUBLE) * scale + 0.5) AS BIGINT)) AS q
      |  FROM sc)
      |SELECT vec_id, max_abs,
      |  CAST(list_sum(q) AS BIGINT) AS q_sum,
      |  CAST(list_sum(list_transform(q, x -> abs(x))) AS BIGINT) AS q_l1
      |FROM qv
      |ORDER BY vec_id""".stripMargin) { (s, dir) =>
    graft.operators.Embeddings.quantizeInt8(
        Tables.embeddings(s, dir), "vec_id", "embedding")
      .orderBy(col("vec_id"))
  }

  /** Element-wise mean pooling per label (see
    * [[graft.operators.Embeddings.meanPool]]), emitted long-format
    * (label, pos, m) so the oracle compares scalars, not lists. */
  val q61 = GQuery("q61_mean_pool",
    """SELECT label, pos, CASE WHEN m0 = 0 THEN 0.0 ELSE m0 END AS m
      |FROM (
      |  SELECT label, u.pos - 1 AS pos,
      |    round(sum(CAST(round(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT))
      |      / (count(u.x) * 1000000.0), 4) AS m0
      |  FROM (
      |    SELECT label, unnest(
      |      [{'pos': i, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS u
      |    FROM embeddings)
      |  GROUP BY label, u.pos)
      |ORDER BY label, pos""".stripMargin) { (s, dir) =>
    graft.operators.Embeddings.meanPool(Tables.embeddings(s, dir), "label", "embedding")
      .select(col("key").as("label"), posexplode(col("pooled")).as(Seq("pos", "m")))
      .orderBy(col("label"), col("pos"))
  }

  /** MMR diversity re-rank over the brute-force pool (see
    * [[graft.operators.Similarity.mmrTopK]]). The greedy trajectory is
    * fully deterministic (6-dp relevance + bit-parity unrounded pairwise
    * cosines + (score DESC, corpus_id) argmax), so the oracle REPLAYS
    * all k iterations as chained MATERIALIZED CTEs (the q83/q100
    * idiom): pool top-m, the pool-pair cosine matrix, then per
    * iteration candidate scores λ·rel − (1−λ)·max-sim-to-selected with
    * Scala-rendered constants, a 1-row window argmax, and the selected
    * set accumulated by UNION ALL. Scores compare at FULL double
    * precision in both engines (the unrolled cosSql bit-parity q31
    * established); only the emitted mmr_score is grid-rounded (7 dp —
    * see the operator's boundary note). */
  val q62 = {
    val M = 50
    val Lam = 0.7
    def cte(name: String, body: String, mat: Boolean = true): String =
      s"$name AS ${if (mat) "MATERIALIZED " else ""}($body)"
    val poolCos = VectorFunctions.cosineSql("qv", "cv", Dim)
    val pairCos = VectorFunctions.cosineSql("x.cv", "y.cv", Dim)
    val head = Seq(
      cte("q", s"""
        |  SELECT vec_id AS query_id, embedding AS qv FROM embeddings
        |  WHERE vec_id < $NQueries""".stripMargin, mat = false),
      cte("c", """
        |  SELECT vec_id AS corpus_id, embedding AS cv FROM embeddings"""
        .stripMargin, mat = false),
      cte("pool", s"""
        |  SELECT query_id, corpus_id, cosine FROM (
        |    SELECT query_id, corpus_id, cosine,
        |      row_number() OVER (PARTITION BY query_id
        |        ORDER BY cosine DESC, corpus_id) AS rn
        |    FROM (SELECT query_id, corpus_id, round($poolCos, 6) AS cosine
        |          FROM q, c WHERE corpus_id <> query_id))
        |  WHERE rn <= $M""".stripMargin),
      cte("pv", """
        |  SELECT p.query_id, p.corpus_id, p.cosine, c.cv
        |  FROM pool p JOIN c USING (corpus_id)""".stripMargin),
      cte("ps", s"""
        |  SELECT x.query_id, x.corpus_id AS a, y.corpus_id AS b,
        |    $pairCos AS sim
        |  FROM pv x JOIN pv y
        |    ON x.query_id = y.query_id AND x.corpus_id <> y.corpus_id"""
        .stripMargin),
      cte("sel0", """
        |  SELECT CAST(NULL AS BIGINT) AS query_id,
        |    CAST(NULL AS BIGINT) AS corpus_id WHERE FALSE""".stripMargin,
        mat = false))
    val iters = (1 to K).flatMap { j =>
      Seq(
        cte(s"cand$j", s"""
          |  SELECT p.query_id, p.corpus_id,
          |    $Lam * p.cosine - ${1 - Lam} * coalesce(m.pen, 0.0) AS score
          |  FROM pool p
          |  LEFT JOIN (SELECT ps.query_id, ps.a AS corpus_id,
          |               max(ps.sim) AS pen
          |             FROM ps JOIN sel${j - 1} s
          |               ON ps.query_id = s.query_id AND ps.b = s.corpus_id
          |             GROUP BY 1, 2) m
          |    ON m.query_id = p.query_id AND m.corpus_id = p.corpus_id
          |  WHERE NOT EXISTS (SELECT 1 FROM sel${j - 1} s
          |                    WHERE s.query_id = p.query_id
          |                      AND s.corpus_id = p.corpus_id)"""
          .stripMargin),
        cte(s"pick$j", s"""
          |  SELECT query_id, corpus_id, score, $j AS rank FROM (
          |    SELECT query_id, corpus_id, score,
          |      row_number() OVER (PARTITION BY query_id
          |        ORDER BY score DESC, corpus_id) AS r
          |    FROM cand$j) WHERE r = 1""".stripMargin),
        cte(s"sel$j", s"""
          |  SELECT query_id, corpus_id FROM sel${j - 1}
          |  UNION ALL SELECT query_id, corpus_id FROM pick$j""".stripMargin))
    }
    val union = (1 to K).map(j => s"SELECT * FROM pick$j")
      .mkString("\nUNION ALL\n")
    GQuery("q62_mmr_rerank",
      "WITH " + (head ++ iters).mkString(",\n") + s"""
        |SELECT query_id, corpus_id,
        |  CASE WHEN s0 = 0 THEN 0.0 ELSE s0 END AS mmr_score,
        |  CAST(rank AS INT) AS rank
        |FROM (SELECT query_id, corpus_id, round(score, 7) AS s0, rank
        |      FROM ($union))
        |ORDER BY query_id, rank""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Similarity.mmrTopK(emb, emb.filter(col("vec_id") < NQueries),
          "vec_id", "embedding", k = K, m = M, dim = Dim, lambda = Lam)
        .orderBy(col("query_id"), col("rank"))
    }
  }

  /** Embedding-cosine near-duplicate pairs (see
    * [[graft.operators.Similarity.cosineNearDupPairs]]): all same-bucket
    * pairs with cosine ≥ τ — the embedding-space member of the dedup
    * family (exact / Jaccard / MinHash / SimHash / cosine). τ = 0.3
    * because the synthetic embeddings are near-orthogonal (max pairwise
    * cosine ≈ 0.5); a real corpus would use ~0.95. The oracle recomputes
    * the sign buckets and the unrolled dot product exactly. */
  val q66 = {
    val Tau = 0.3
    val ab = VectorFunctions.signBucketSql("a.embedding", Bits)
    val bb = VectorFunctions.signBucketSql("b.embedding", Bits)
    GQuery("q66_cosine_near_dups",
      s"""WITH scored AS (
         |  SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |    round(${VectorFunctions.cosineSql("a.embedding", "b.embedding", Dim)}, 6) AS cosine
         |  FROM embeddings a JOIN embeddings b
         |    ON a.vec_id < b.vec_id AND $ab = $bb)
         |SELECT id_a, id_b, cosine FROM scored WHERE cosine >= $Tau
         |ORDER BY id_a, id_b""".stripMargin) { (s, dir) =>
      Similarity.cosineNearDupPairs(Tables.embeddings(s, dir),
          "vec_id", "embedding", dim = Dim, threshold = Tau, bits = Bits)
        .orderBy(col("id_a"), col("id_b"))
    }
  }

  /** SemDeDup over the embeddings table (see
    * [[graft.operators.Similarity.semDedup]]). τ = 0.3 because the
    * synthetic embeddings are near-orthogonal (like q66); a real corpus
    * would use ~0.95+. Driver-green: the oracle replays the IVF k-means
    * ([[AnnOracles]]) and applies the same min-id eviction rule within
    * the replayed clusters; `SemDeDupSpec` keeps the brute-force
    * soundness/completeness proof. */
  val q72 = GQuery("q72_semdedup",
    AnnOracles.semDedupSql(dim = Dim, nlist = 16, iters = 3,
      tau = 0.3)) { (s, dir) =>
    Similarity.semDedupAssigned(sharedIvf(s, dir)._2, tau = 0.3)
      .orderBy(col("vec_id"))
  }

  /** The trained PQ index — codebooks + encoded corpus — memoized per
    * (session, dir) like [[sharedIvf]]: train once, every consumer
    * reads the stored codes. Training is EAGER (Lloyd collects), so
    * plan-identity caching cannot dedup it. */
  private val pqCache = new SessionCache[
    (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame)]

  private def sharedPq(s: org.apache.spark.sql.SparkSession, dir: String)
      : (Array[Array[Array[Double]]], org.apache.spark.sql.DataFrame) =
    pqCache.get(s, dir) {
      val books = Similarity.pqTrain(Tables.embeddings(s, dir),
        "vec_id", "embedding", dim = Dim, m = 8, ksub = 16, iters = 3)
      val enc = Similarity.pqEncode(Tables.embeddings(s, dir),
          "vec_id", "embedding", books)
        .localCheckpoint(true)
      (books, enc)
    }

  /** Product-quantization ADC top-k with exact re-rank (see
    * [[graft.operators.Similarity.pqTopK]]) — the compressed-index
    * member of the ANN family (brute / sign-LSH / IVF / PQ): corpus
    * scanned as m=8 code bytes per vector, exact vectors touched only
    * for the top-`refine` candidates. Driver-green like q32b: the
    * oracle replays the joint-subspace Lloyd training, the code
    * assignment, the ADC tables, and the refine + re-rank
    * ([[AnnOracles]]); recall floors stay in `PqJlSparseSpec`. */
  val q95 = GQuery("q95_pq_topk",
    AnnOracles.pqTopKSql(dim = Dim, m = 8, ksub = 16, iters = 3,
      nQueries = NQueries, k = K, refine = 50)) { (s, dir) =>
    val (books, enc) = sharedPq(s, dir)
    Similarity.pqTopK(enc, books,
        Tables.embeddings(s, dir).filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding", k = K, refine = 50)
      .orderBy(col("query_id"), col("rn"))
  }

  /** Johnson–Lindenstrauss ±1 random projection 64 → 16 dims (see
    * [[graft.operators.Embeddings.jlProject]]). The sign matrix is a
    * deterministic md5-derived constant, so the oracle inlines the SAME
    * ±1 literals with the same left-fold summation order — bit parity,
    * no approximation in the CHECK (the approximation is in what the
    * projection preserves, asserted separately in `JlSpec`). */
  val q97 = {
    val DimOut = 16
    val structs = (0 until DimOut).map { j =>
      s"{'j': $j, 'y': ${graft.operators.Embeddings.jlProjectSql("embedding", Dim, DimOut, j)}}"
    }.mkString(", ")
    GQuery("q97_jl_project",
      s"""SELECT vec_id, j, CASE WHEN y0 = 0 THEN 0.0 ELSE y0 END AS y FROM (
         |  SELECT vec_id, u.j AS j, round(u.y, 6) AS y0 FROM (
         |    SELECT vec_id, unnest([$structs]) AS u FROM embeddings))
         |ORDER BY vec_id, j""".stripMargin) { (s, dir) =>
      graft.operators.Embeddings.jlProject(Tables.embeddings(s, dir),
          "vec_id", "embedding", dimIn = Dim, dimOut = DimOut)
        .orderBy(col("vec_id"), col("j"))
    }
  }

  /** IVF-PQ top-k (see [[graft.operators.Similarity.ivfPqTopK]]) — the
    * two approximation cuts composed, FAISS-IVFPQ style: IVF list
    * pruning (~nprobe/nlist of the corpus) × PQ compressed scan (m
    * table lookups per candidate) + exact re-rank. Reuses BOTH shared
    * indexes: the memoized IVF assignment and the memoized PQ
    * codebooks — the stored-index reuse a real serving pipeline does.
    * Driver-green like q32b/q95: the oracle replays BOTH trainings and
    * composes probe × ADC × re-rank ([[AnnOracles]]); recall floors
    * stay in PqJlSparseSpec. */
  val q99 = GQuery("q99_ivfpq_topk",
    AnnOracles.ivfPqTopKSql(dim = Dim, nlist = 16, ivfIters = 3,
      m = 8, ksub = 16, pqIters = 3, nQueries = NQueries,
      k = K, nprobe = 4, refine = 50)) { (s, dir) =>
    val (cents, assigned) = sharedIvf(s, dir)
    val (books, _) = sharedPq(s, dir)
    Similarity.ivfPqTopK(Similarity.ivfPqEncode(assigned, books),
        cents, books,
        Tables.embeddings(s, dir).filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding",
        k = K, nprobe = 4, refine = 50)
      .orderBy(col("query_id"), col("rn"))
  }

  /** Contrastive triplet assembly (see
    * [[graft.operators.Similarity.contrastiveTriplets]]): anchor +
    * nearest same-label positive + top-k hard negatives + margin — the
    * training-pair product of the similarity family. The margin is a
    * single subtraction of two already-rounded cosines, so the oracle
    * reproduces it exactly with no extra rounding. */
  val q101 = GQuery("q101_contrastive_triplets",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS q_label
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label AS c_label
       |      FROM embeddings),
       |ps AS (
       |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
       |  FROM q JOIN c ON c_label = q_label AND corpus_id <> query_id),
       |pos AS (
       |  SELECT query_id, corpus_id AS pos_id, cosine AS pos_cosine FROM (
       |    SELECT query_id, corpus_id, cosine,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, corpus_id) AS rn
       |    FROM ps) WHERE rn = 1),
       |ns AS (
       |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
       |  FROM q JOIN c ON c_label <> q_label),
       |neg AS (
       |  SELECT query_id, corpus_id AS neg_id, cosine AS neg_cosine,
       |    CAST(rn AS INT) AS neg_rank FROM (
       |    SELECT query_id, corpus_id, cosine,
       |      row_number() OVER (PARTITION BY query_id
       |        ORDER BY cosine DESC, corpus_id) AS rn
       |    FROM ns) WHERE rn <= $K)
       |SELECT query_id, pos_id, pos_cosine, neg_id, neg_cosine, neg_rank,
       |  pos_cosine - neg_cosine AS margin
       |FROM pos JOIN neg USING (query_id)
       |ORDER BY query_id, neg_rank""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.contrastiveTriplets(emb, emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding", labelCol = "label", kNeg = K)
      .orderBy(col("query_id"), col("neg_rank"))
  }

  /** Recall@k audit of the whole ANN family (see
    * [[graft.operators.Similarity.annRecall]]): per query point, the
    * exact-overlap fraction of the IVF / PQ / IVF-PQ top-k against the
    * brute-force ground truth — the registry-visible version of the
    * recall floors PqJlSparseSpec/LshRecallSpec assert. Driver-green
    * like its subjects: the oracle replays all three ANN paths AND the
    * brute-force pool, then computes the same zero-filled overlap
    * fractions ([[AnnOracles]]). Reuses both memoized indexes; the
    * exact pool is one extra brute-force pass over the same broadcast
    * query set. */
  val q109 = GQuery("q109_ann_recall",
    AnnOracles.annRecallSql(dim = Dim, nlist = 16, ivfIters = 3,
      m = 8, ksub = 16, pqIters = 3, nQueries = NQueries,
      k = K, nprobe = 4, refine = 50)) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    val queries = emb.filter(col("vec_id") < NQueries)
    val exact = sharedExact(s, dir)
    val (cents, assigned) = sharedIvf(s, dir)
    val (books, enc) = sharedPq(s, dir)
    Seq(
      "ivf" -> Similarity.ivfProbe(assigned, cents, queries,
        "vec_id", "embedding", k = K, nprobe = 4),
      "pq" -> Similarity.pqTopK(enc, books, queries,
        "vec_id", "embedding", k = K, refine = 50),
      "ivf_pq" -> Similarity.ivfPqTopK(Similarity.ivfPqEncode(assigned, books),
        cents, books, queries, "vec_id", "embedding",
        k = K, nprobe = 4, refine = 50))
      .map { case (m, approx) =>
        Similarity.annRecall(exact, approx, K).withColumn("method", lit(m))
      }
      .reduce(_ unionAll _)
      .select(col("method"), col("query_id"), col("n_hits"), col("recall"))
      .orderBy(col("method"), col("query_id"))
  }

  /** Attribute-FILTERED IVF probe (see
    * [[graft.operators.Similarity.ivfProbeFiltered]]) — "vector search
    * with a WHERE clause": each query retrieves top-k among corpus
    * vectors sharing its OWN label, the filter applied before any
    * cosine (pre-filter, so a selective attribute prunes probe lists
    * instead of starving top-k). Reuses the shared IVF index with the
    * label joined in once — the attribute-in-index build — and the
    * oracle replays train + probe + the label-filtered scoring. */
  val q124 = GQuery("q124_filtered_ann",
    AnnOracles.ivfTopKFilteredSql(dim = Dim, nlist = 16, iters = 3,
      nQueries = NQueries, nprobe = 4, k = K)) { (s, dir) =>
    val (cents, assigned) = sharedIvf(s, dir)
    val emb = Tables.embeddings(s, dir)
    val labeled = assigned.join(
      emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
    Similarity.ivfProbeFiltered(labeled, cents,
        emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding",
        attrCol = "label", targetCol = "label", k = K, nprobe = 4)
      .orderBy(col("query_id"), col("rn"))
  }

  /** Source-balanced retrieval (see
    * [[graft.operators.Similarity.ivfProbeGrouped]]): per-(query, label)
    * quotas — the best 3 of EVERY label per query, so no dominant
    * group crowds the result the way a global top-k lets it. Same
    * shared index with labels joined in; oracle replays the probe with
    * the quota window. */
  val q125 = GQuery("q125_grouped_ann",
    AnnOracles.ivfTopKGroupedSql(dim = Dim, nlist = 16, iters = 3,
      nQueries = NQueries, nprobe = 4, perGroupK = 3)) { (s, dir) =>
    val (cents, assigned) = sharedIvf(s, dir)
    val emb = Tables.embeddings(s, dir)
    val labeled = assigned.join(
      emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
    Similarity.ivfProbeGrouped(labeled, cents,
        emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding",
        groupCol = "label", perGroupK = 3, nprobe = 4)
      .orderBy(col("query_id"), col("label"), col("rn"))
  }

  /** Group-aware WIDENED grouped probe (see
    * [[graft.operators.Similarity.ivfProbeGroupedWidened]]) — q125's
    * starvation caveat closed: at nprobe=1 a fixed probe leaves many
    * (query, label) quotas short (86 pairs on the sf0.001 embeddings,
    * spec-measured); the widened probe extends each (query, label)'s
    * centroid prefix until its quota is reachable. The oracle replays
    * the ENTIRE closed form — Lloyd train, the per-(cid, label)
    * census, the self-exclusion-adjusted cumulative prefix window,
    * and the quota ranking — so the hash matches only if the widening
    * arithmetic agrees clause-for-clause. */
  val q130 = GQuery("q130_widened_ann",
    AnnOracles.ivfTopKGroupedWidenedSql(dim = Dim, nlist = 16, iters = 3,
      nQueries = NQueries, nprobe = 1, perGroupK = 3)) { (s, dir) =>
    val (cents, assigned) = sharedIvf(s, dir)
    val emb = Tables.embeddings(s, dir)
    val labeled = assigned.join(
      emb.select(col("vec_id").as("corpus_id"), col("label")), "corpus_id")
    Similarity.ivfProbeGroupedWidened(labeled, cents,
        emb.filter(col("vec_id") < NQueries),
        idCol = "vec_id", vecCol = "embedding",
        groupCol = "label", perGroupK = 3, nprobe = 1)
      .orderBy(col("query_id"), col("label"), col("rn"))
  }

  /** Retrieval-quality metrics (see
    * [[graft.operators.Search.evalRanked]]): the q31 exact-cosine
    * ranking scored against the same-label truth set — per query,
    * hits@k / first-relevant rank / MRR / nDCG@k with every log2
    * discount on the 1e-4 integer grid so both engines sum identical
    * integers. The oracle replays the ranking (unrolled cosine) AND
    * the full metric arithmetic. */
  val q140 = GQuery("q140_retrieval_eval",
    s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv, label AS ql
       |           FROM embeddings WHERE vec_id < $NQueries),
       |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label AS cl
       |      FROM embeddings),
       |scored AS (
       |  SELECT query_id, corpus_id, ql, cl, round($cosSql, 6) AS cosine
       |  FROM q, c WHERE corpus_id <> query_id),
       |rk AS (
       |  SELECT query_id, corpus_id, ql, cl,
       |    CAST(row_number() OVER (PARTITION BY query_id
       |      ORDER BY cosine DESC, corpus_id) AS INT) AS rn
       |  FROM scored),
       |nrel AS (
       |  SELECT q.query_id, count(*) AS n_rel
       |  FROM q JOIN c ON c.cl = q.ql AND c.corpus_id <> q.query_id
       |  GROUP BY q.query_id),
       |perq AS (
       |  SELECT query_id,
       |    CAST(sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_rel_at_k,
       |    min(CASE WHEN cl = ql THEN rn END) AS fr,
       |    CAST(sum(CASE WHEN cl = ql
       |      THEN CAST(round(1e4 / log2(rn + 1)) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS dcg4
       |  FROM rk WHERE rn <= $K GROUP BY query_id),
       |m AS (
       |  SELECT p.query_id, p.n_rel_at_k,
       |    coalesce(p.fr, 0) AS first_rel_rank,
       |    coalesce(CAST(round(1e4 / p.fr) AS BIGINT), 0) AS mrr4,
       |    p.dcg4,
       |    CAST(list_sum([CAST(round(1e4 / log2(i + 1)) AS BIGINT)
       |      for i in range(1, least(n.n_rel, $K) + 1)]) AS BIGINT) AS idcg4
       |  FROM perq p JOIN nrel n USING (query_id))
       |SELECT query_id, n_rel_at_k, first_rel_rank, mrr4, dcg4, idcg4,
       |  round(dcg4 * 1.0 / idcg4, 4) AS ndcg
       |FROM m ORDER BY query_id""".stripMargin) { (s, dir) =>
    import graft.operators.Search
    val emb = Tables.embeddings(s, dir)
    val ranked = sharedExact(s, dir)
    val lab = emb.select(col("vec_id"), col("label"))
    val rel = lab.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("label"))
      .join(lab.select(col("vec_id").as("corpus_id"), col("label")),
        Seq("label"))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"))
    Search.evalRanked(ranked, rel, K).orderBy(col("query_id"))
  }

  /** ANN-quality regression gate: [[graft.operators.Search.evalRanked]]
    * over the q32b IVF probe ranking — nDCG/MRR of the APPROXIMATE
    * index against the same-label truth, the metric an index rollout
    * gates on (q109 measures recall vs brute force; this measures
    * end-task retrieval quality). The oracle chains the full Lloyd
    * replay + probe + bucket-confined ranking with the q140 metric
    * arithmetic in one statement. */
  val q141 = GQuery("q141_ann_eval", {
    val scored = s"""scored AS (
      |  SELECT p.query_id, a.corpus_id,
      |    round(${VectorFunctions.cosineSql("p.qv", "a.cv", Dim)}, 6) AS cosine
      |  FROM probe p JOIN asgf a USING (cid)
      |  WHERE a.corpus_id <> p.query_id)""".stripMargin
    val tail = s"""lbl AS (SELECT vec_id, label FROM embeddings),
      |rk AS (
      |  SELECT query_id, corpus_id,
      |    CAST(row_number() OVER (PARTITION BY query_id
      |      ORDER BY cosine DESC, corpus_id) AS INT) AS rn
      |  FROM scored),
      |rkl AS (
      |  SELECT rk.query_id, rk.corpus_id, rk.rn, lq.label AS ql, lc.label AS cl
      |  FROM rk
      |  JOIN lbl lq ON lq.vec_id = rk.query_id
      |  JOIN lbl lc ON lc.vec_id = rk.corpus_id),
      |nrel AS (
      |  SELECT a.vec_id AS query_id, count(*) AS n_rel
      |  FROM lbl a JOIN lbl b ON b.label = a.label AND b.vec_id <> a.vec_id
      |  WHERE a.vec_id < $NQueries GROUP BY a.vec_id),
      |perq AS (
      |  SELECT query_id,
      |    CAST(sum(CASE WHEN cl = ql THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_rel_at_k,
      |    min(CASE WHEN cl = ql THEN rn END) AS fr,
      |    CAST(sum(CASE WHEN cl = ql
      |      THEN CAST(round(1e4 / log2(rn + 1)) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS dcg4
      |  FROM rkl WHERE rn <= $K GROUP BY query_id),
      |m AS (
      |  SELECT p.query_id, p.n_rel_at_k,
      |    coalesce(p.fr, 0) AS first_rel_rank,
      |    coalesce(CAST(round(1e4 / p.fr) AS BIGINT), 0) AS mrr4,
      |    p.dcg4,
      |    CAST(list_sum([CAST(round(1e4 / log2(i + 1)) AS BIGINT)
      |      for i in range(1, least(n.n_rel, $K) + 1)]) AS BIGINT) AS idcg4
      |  FROM perq p JOIN nrel n USING (query_id))
      |SELECT query_id, n_rel_at_k, first_rel_rank, mrr4, dcg4, idcg4,
      |  round(dcg4 * 1.0 / idcg4, 4) AS ndcg
      |FROM m ORDER BY query_id""".stripMargin
    "WITH " + (AnnOracles.ivfChain(Dim, 16, 3) ++
      AnnOracles.probeChain(Dim, NQueries, 3, nprobe = 4) :+ scored :+ tail)
      .mkString(",\n")
  }) { (s, dir) =>
    import graft.operators.Search
    val (cents, assigned) = sharedIvf(s, dir)
    val emb = Tables.embeddings(s, dir)
    val ranked = Similarity.ivfProbe(assigned, cents,
      emb.filter(col("vec_id") < NQueries),
      idCol = "vec_id", vecCol = "embedding", k = K, nprobe = 4)
    val lab = emb.select(col("vec_id"), col("label"))
    val rel = lab.where(col("vec_id") < NQueries)
      .select(col("vec_id").as("query_id"), col("label"))
      .join(lab.select(col("vec_id").as("corpus_id"), col("label")),
        Seq("label"))
      .where(col("corpus_id") =!= col("query_id"))
      .select(col("query_id"), col("corpus_id"))
    Search.evalRanked(ranked, rel, K).orderBy(col("query_id"))
  }

  /** Mutual-NN margin mining between two embedding populations (see
    * [[graft.operators.Similarity.mutualMarginPairs]]): label 0 plays
    * the source "language", label 1 the target — a pair is mined iff
    * each side is the other's top-1 cross-population neighbor, with
    * both sides' top1−top2 margins attached. The oracle replays both
    * ranking directions and the mutual join. */
  val q152 = GQuery("q152_mutual_margin_mining",
    s"""WITH a AS (SELECT vec_id AS id_a, embedding AS qv
       |           FROM embeddings WHERE label = 0),
       |b AS (SELECT vec_id AS id_b, embedding AS cv
       |      FROM embeddings WHERE label = 1),
       |scored AS (
       |  SELECT id_a, id_b, round($cosSql, 6) AS cosine FROM a, b),
       |ra AS (SELECT id_a, id_b, cosine,
       |    row_number() OVER (PARTITION BY id_a ORDER BY cosine DESC, id_b) AS rn
       |  FROM scored),
       |ta AS (
       |  SELECT id_a,
       |    max(CASE WHEN rn = 1 THEN id_b END) AS best_b,
       |    max(CASE WHEN rn = 1 THEN cosine END) AS cos_a,
       |    coalesce(max(CASE WHEN rn = 2 THEN cosine END), -1.0) AS cos2_a
       |  FROM ra WHERE rn <= 2 GROUP BY id_a),
       |rb AS (SELECT id_a, id_b, cosine,
       |    row_number() OVER (PARTITION BY id_b ORDER BY cosine DESC, id_a) AS rn
       |  FROM scored),
       |tb AS (
       |  SELECT id_b,
       |    max(CASE WHEN rn = 1 THEN id_a END) AS best_a,
       |    coalesce(max(CASE WHEN rn = 2 THEN cosine END), -1.0) AS cos2_b
       |  FROM rb WHERE rn <= 2 GROUP BY id_b)
       |SELECT ta.id_a, tb.id_b, ta.cos_a AS cosine,
       |  round(ta.cos_a - ta.cos2_a, 6) AS margin_a,
       |  round(ta.cos_a - tb.cos2_b, 6) AS margin_b
       |FROM ta JOIN tb ON ta.best_b = tb.id_b AND tb.best_a = ta.id_a
       |ORDER BY id_a""".stripMargin) { (s, dir) =>
    val emb = Tables.embeddings(s, dir)
    Similarity.mutualMarginPairs(
        emb.filter(col("label") === 0), emb.filter(col("label") === 1),
        "vec_id", "embedding")
      .orderBy(col("id_a"))
  }

  /** Matryoshka prefix-mass census: for dimension prefixes 8/16/32 of
    * the 64-dim embeddings, the per-vector retained-norm fraction
    * ‖x[1..L]‖ / ‖x‖ (1e-4 grid, the exact cosine between the full
    * vector and its zero-padded truncation) summarized per label —
    * the audit that says whether truncated-dimension ANN (the
    * matryoshka/MRL serving trick) is safe for this embedding space.
    * Per-row grid snap BEFORE the mean keeps both engines on integer
    * aggregation; prefix norms reuse the ordered-fold dot, replayed
    * by the oracle with the same unrolled term chain. */
  val q230 = {
    val Ls = Seq(8, 16, 32)
    val union = Ls.map { l =>
      s"""SELECT label, CAST($l AS BIGINT) AS prefix_dim,
         |  CAST(round(1e4 * sqrt(
         |    (${VectorFunctions.dotSql("embedding", "embedding", l)})
         |    / (${VectorFunctions.dotSql("embedding", "embedding", Dim)})))
         |    AS BIGINT) AS frac4
         |FROM embeddings""".stripMargin
    }.mkString("\nUNION ALL\n")
    GQuery("q230_matryoshka_mass",
      s"""WITH r AS (
         |$union)
         |SELECT label, prefix_dim, count(*) AS n_vecs,
         |  CAST(round(avg(frac4)) AS BIGINT) AS avg_frac4,
         |  min(frac4) AS min_frac4
         |FROM r GROUP BY 1, 2 ORDER BY label, prefix_dim""".stripMargin) {
      (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      Ls.map { l =>
        emb.select(col("label"), lit(l.toLong).as("prefix_dim"),
          round(lit(1e4) * sqrt(
            VectorFunctions.normSq(slice(col("embedding"), 1, l))
              / VectorFunctions.normSq(col("embedding"))))
            .cast("long").as("frac4"))
      }.reduce(_ unionAll _)
        .groupBy("label", "prefix_dim")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("frac4"))).cast("long").as("avg_frac4"),
          min(col("frac4")).as("min_frac4"))
        .orderBy(col("label"), col("prefix_dim"))
    }
  }

  /** Truncated-dimension retrieval recall: brute-force top-k under
    * prefix-dim cosine (16 and 32 of 64) audited against the full-dim
    * exact top-k with the q109 recall machinery — q230 reports how
    * much NORM the prefixes keep; this reports what that costs in
    * actual retrieval, the number a matryoshka serving tier is
    * justified by. Prefix cosine IS `cosineSql` at the lower dim, so
    * the oracle replays both rankings and the zero-filled overlap. */
  val q231 = {
    val Ls = Seq(16, 32)
    def topK(name: String, dim: Int): String =
      s"""${name}_s AS (
         |  SELECT q.query_id, v.corpus_id,
         |    round(${VectorFunctions.cosineSql("q.qv", "v.cv", dim)}, 6)
         |      AS cosine
         |  FROM q, cvt v WHERE v.corpus_id <> q.query_id),
         |$name AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, corpus_id) AS rn
         |    FROM ${name}_s) WHERE rn <= $K)""".stripMargin
    val recalls = Ls.map { l =>
      s"""SELECT 'dim$l' AS method, e.query_id,
         |  CAST(coalesce(h.n, 0) AS BIGINT) AS n_hits,
         |  round(coalesce(h.n, 0) / CAST($K AS DOUBLE), 4) AS recall
         |FROM (SELECT DISTINCT query_id FROM r_exact) e
         |LEFT JOIN (SELECT x.query_id, count(*) AS n
         |           FROM r_exact x JOIN r_dim$l a
         |             ON a.query_id = x.query_id
         |            AND a.corpus_id = x.corpus_id
         |           GROUP BY x.query_id) h ON h.query_id = e.query_id"""
        .stripMargin
    }.mkString("\nUNION ALL\n")
    GQuery("q231_truncated_recall",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv
         |  FROM embeddings WHERE vec_id < $NQueries),
         |cvt AS (SELECT vec_id AS corpus_id, embedding AS cv
         |  FROM embeddings),
         |${topK("r_exact", Dim)},
         |${Ls.map(l => topK(s"r_dim$l", l)).mkString(",\n")}
         |$recalls
         |ORDER BY method, query_id""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val queries = emb.filter(col("vec_id") < NQueries)
      val exact = sharedExact(s, dir)
      val out = Ls.map { l =>
        val cut = (df: org.apache.spark.sql.DataFrame) =>
          df.withColumn("embedding", slice(col("embedding"), 1, l))
        val approx = Similarity.bruteForceTopK(cut(emb), cut(queries),
          "vec_id", "embedding", k = K, dim = l)
        Similarity.annRecall(exact, approx, K)
          .withColumn("method", lit(s"dim$l"))
      }.reduce(_ unionAll _)
        .select(col("method"), col("query_id"), col("n_hits"), col("recall"))
        .orderBy(col("method"), col("query_id"))
      out
    }
  }

  /** IVF index balance audit: the inverted-list size distribution of
    * the shared index — list count, max list and its corpus share,
    * and the Gini of list sizes ([[graft.operators.Profiling
    * .giniByGroup]] over the size cells) — a skewed index means probe
    * latency is one hot list away from brute force, and REBALANCE
    * (retrain, or split hot lists) is the fix this report triggers.
    * The oracle replays Lloyd training, assignment, and the rank-sum
    * Gini arithmetic. */
  val q248 = GQuery("q248_ivf_balance",
    "WITH " + AnnOracles.ivfChain(Dim, 16, 3).mkString(",\n") +
      s""",
         |sizes AS (SELECT cid, CAST(count(*) AS BIGINT) AS sz
         |  FROM asgf GROUP BY cid),
         |tot AS (SELECT CAST(count(*) AS BIGINT) AS n_lists,
         |  CAST(sum(sz) AS BIGINT) AS n_vectors,
         |  CAST(max(sz) AS BIGINT) AS max_list FROM sizes),
         |cells AS (SELECT sz AS v, CAST(count(*) AS BIGINT) AS m
         |  FROM sizes GROUP BY sz),
         |cum AS (
         |  SELECT v, m,
         |    CAST(coalesce(sum(m) OVER (ORDER BY v
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
         |      AS BIGINT) AS c
         |  FROM cells),
         |parts AS (
         |  SELECT CAST(v AS HUGEINT) * (2 * m * c + m * (m + 1)) AS u,
         |    CAST(v AS HUGEINT) * m AS t, m
         |  FROM cum),
         |agg AS (SELECT CAST(sum(m) AS BIGINT) AS n, sum(u) AS s2,
         |  sum(t) AS t FROM parts)
         |SELECT tot.n_lists, tot.n_vectors, tot.max_list,
         |  CAST(round(1e4 * tot.max_list / tot.n_vectors) AS BIGINT)
         |    AS max_share4,
         |  CAST(round(1e4 * (CAST(s2 AS DOUBLE) - (n + 1)
         |      * CAST(t AS DOUBLE)) / (n * CAST(t AS DOUBLE))) AS BIGINT)
         |    AS gini4
         |FROM tot, agg""".stripMargin) { (s, dir) =>
    val (_, assigned) = sharedIvf(s, dir)
    val sizes = assigned.groupBy("cid").agg(count(lit(1)).as("sz"))
    val tot = sizes.agg(count(lit(1)).as("n_lists"),
      sum(col("sz")).as("n_vectors"), max(col("sz")).as("max_list"))
    val gini = graft.operators.Profiling
      .giniByGroup(sizes.withColumn("g", lit("all")), "g", "sz")
      .select(col("gini4"))
    tot.crossJoin(broadcast(gini))
      .select(col("n_lists"), col("n_vectors"), col("max_list"),
        round(lit(1e4) * col("max_list") / col("n_vectors")).cast("long")
          .as("max_share4"),
        col("gini4"))
  }

  /** Label-centroid distance outliers — the mislabeled-embedding
    * screen: each vector's squared distance to its OWN label's mean
    * (the q61 integer-grid meanPool centroid, exact cross-engine),
    * snapped per row to the 1e-4 grid; vectors beyond 4× their
    * label's mean distance are flagged. The oracle replays the pooled
    * centroid, the unrolled diff-square chain in the fold's exact
    * order, and the two-pass outlier rule. */
  val q254 = {
    val chain = (1 to Dim).map(i =>
      s"(CAST(embedding[$i] AS DOUBLE) - cent[$i]) * " +
        s"(CAST(embedding[$i] AS DOUBLE) - cent[$i])").mkString(" + ")
    GQuery("q254_label_outliers",
      s"""WITH cm AS (
         |  SELECT label, u.pos - 1 AS pos,
         |    round(sum(CAST(round(CAST(u.x AS DOUBLE) * 1000000) AS BIGINT))
         |      / (count(u.x) * 1000000.0), 4) AS m0
         |  FROM (
         |    SELECT label, unnest(
         |      [{'pos': i, 'x': embedding[i]} for i in range(1, len(embedding) + 1)]) AS u
         |    FROM embeddings)
         |  GROUP BY label, u.pos),
         |cl AS (
         |  SELECT label, list(CASE WHEN m0 = 0 THEN 0.0 ELSE m0 END
         |    ORDER BY pos) AS cent
         |  FROM cm GROUP BY label),
         |dd AS (
         |  SELECT e.label, e.vec_id,
         |    CAST(round(1e4 * ($chain)) AS BIGINT) AS d4
         |  FROM embeddings e JOIN cl USING (label)),
         |s1 AS (
         |  SELECT label, count(*) AS n_vecs,
         |    CAST(round(avg(d4)) AS BIGINT) AS mean_d4
         |  FROM dd GROUP BY label),
         |fin AS (
         |  SELECT dd.label,
         |    CAST(sum(CASE WHEN dd.d4 > 4 * s1.mean_d4 THEN 1 ELSE 0 END)
         |      AS BIGINT) AS n_outliers
         |  FROM dd JOIN s1 USING (label) GROUP BY dd.label)
         |SELECT s1.label, s1.n_vecs, s1.mean_d4, fin.n_outliers
         |FROM s1 JOIN fin USING (label) ORDER BY label""".stripMargin) {
      (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val cents = graft.operators.Embeddings
        .meanPool(emb, "label", "embedding")
        .select(col("key").as("label"), col("pooled").as("cent"))
      val dist = aggregate(
        zip_with(col("embedding"), col("cent"),
          (x, m) => (x.cast("double") - m) * (x.cast("double") - m)),
        lit(0.0), (acc, t) => acc + t)
      val dd = emb.join(broadcast(cents), "label")
        .select(col("label"), col("vec_id"),
          round(lit(1e4) * dist).cast("long").as("d4"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val s1 = dd.groupBy("label")
        .agg(count(lit(1)).as("n_vecs"),
          round(avg(col("d4"))).cast("long").as("mean_d4"))
      val fin = dd.join(broadcast(s1.select(col("label"), col("mean_d4"))),
          "label")
        .groupBy("label")
        .agg(sum(when(col("d4") > lit(4L) * col("mean_d4"), 1L)
          .otherwise(0L)).as("n_outliers"))
      s1.join(fin, "label")
        .select(col("label"), col("n_vecs"), col("mean_d4"),
          col("n_outliers"))
        .orderBy(col("label"))
    }
  }

  /** Simplified-silhouette clustering audit (see
    * [[graft.operators.Similarity.silhouetteReport]]): the shared IVF
    * index's per-cluster cohesion/separation — mean s = 1 − a/b over
    * own vs nearest-rival centroid distances on the 1e-6 grid, plus
    * the count of vectors individually closer to a rival (the
    * retrain/split alarm q248's balance audit cannot see: a balanced
    * index can still be badly placed). The oracle replays Lloyd
    * training and the two-smallest-distance window on the replayed
    * centroids — same chained-MATERIALIZED-CTE idiom as q32b/q248. */
  val q260 = GQuery("q260_ivf_silhouette",
    AnnOracles.silhouetteSql(dim = Dim, nlist = 16, iters = 3)) {
    (s, dir) =>
    val (cents, _) = sharedIvf(s, dir)
    Similarity.silhouetteReport(Tables.embeddings(s, dir),
        "vec_id", "embedding", cents)
      .orderBy(col("cid"))
  }

  /** Top principal component of the label-0 embedding slice (see
    * [[graft.operators.Embeddings.pcaTopComponent]]): exact-grid
    * covariance (one mapPartitions Gram pass — integer sums no engine
    * can order-skew) + a 20-step deterministic power iteration, every
    * step re-gridded exactly like Lloyd training. The oracle replays
    * the grid encode, the 64×64 Gram join, the covariance division,
    * and all 20 matvec/renorm rungs as chained MATERIALIZED CTEs —
    * the q83/q32b idiom applied to linear algebra. `share4` (variance
    * explained by one direction) is the number that justifies or
    * refutes a JL/Matryoshka compression decision (q97/q230/q231). */
  /** The shared PCA oracle CTE chain (grid encode → Gram → covariance →
    * `iters` power-iteration rungs, final vector in `v$iters`) — one
    * definition serves q267 and the q268 projection so the replayed
    * component cannot drift between them. */
  private def pcaCtes(iters: Int): String = {
    val ladder = (1 to iters).map { t =>
      s"""w$t AS MATERIALIZED (
         |  SELECT pi AS pos, CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
         |    AS w
         |  FROM cov JOIN v${t - 1} vv ON vv.pos = cov.pj GROUP BY pi),
         |n$t AS (SELECT CAST(sum(w * w) AS HUGEINT) AS n2 FROM w$t),
         |v$t AS MATERIALIZED (
         |  SELECT pos, CAST(floor(1e6 * CAST(w AS DOUBLE)
         |    / sqrt(CAST(n2 AS DOUBLE)) + 0.5) AS BIGINT) AS v
         |  FROM w$t, n$t)""".stripMargin
    }.mkString(",\n")
    s"""x6 AS MATERIALIZED (
       |  SELECT vec_id, u.pos AS pos, u.x6 AS x6 FROM (
       |    SELECT vec_id, unnest([{'pos': i - 1,
       |      'x6': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
       |        AS BIGINT)} for i in range(1, ${Dim + 1})]) AS u
       |    FROM embeddings WHERE label = 0)),
       |nn AS (SELECT CAST(count(DISTINCT vec_id) AS BIGINT) AS n FROM x6),
       |sums AS MATERIALIZED (
       |  SELECT pos, CAST(sum(x6) AS HUGEINT) AS m FROM x6 GROUP BY pos),
       |gram AS MATERIALIZED (
       |  SELECT a.pos AS pi, b.pos AS pj,
       |    CAST(sum(a.x6 * b.x6) AS HUGEINT) AS s
       |  FROM x6 a JOIN x6 b USING (vec_id) GROUP BY 1, 2),
       |cov AS MATERIALIZED (
       |  SELECT pi, pj,
       |    CAST(floor(1e6 * CAST(n * s - ma.m * mb.m AS DOUBLE)
       |      / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * 1e12) + 0.5)
       |      AS BIGINT) AS c
       |  FROM gram JOIN sums ma ON ma.pos = pi
       |  JOIN sums mb ON mb.pos = pj, nn),
       |v0 AS (SELECT pos,
       |  CAST(floor(1e6 / sqrt(${Dim}.0) + 0.5) AS BIGINT) AS v
       |  FROM sums),
       |$ladder""".stripMargin
  }

  private val PcaIters = 20

  val q267 = {
    val iters = PcaIters
    GQuery("q267_pca_top_component",
      s"""WITH ${pcaCtes(iters)},
         |wf AS MATERIALIZED (
         |  SELECT pi AS pos, CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
         |    AS w
         |  FROM cov JOIN v$iters vv ON vv.pos = cov.pj GROUP BY pi),
         |ray AS (
         |  SELECT CAST(sum(CAST(v AS HUGEINT) * w) AS HUGEINT) AS r,
         |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS d
         |  FROM v$iters JOIN wf USING (pos)),
         |tr AS (SELECT CAST(sum(c) AS BIGINT) AS trace6 FROM cov
         |       WHERE pi = pj),
         |scal AS (
         |  SELECT CAST(floor(CAST(r AS DOUBLE) / CAST(d AS DOUBLE) + 0.5)
         |      AS BIGINT) AS eig6, trace6
         |  FROM ray, tr)
         |SELECT CAST(pos AS INT) AS pos, v AS loading6, eig6, trace6,
         |  CAST(floor(1e4 * CAST(eig6 AS DOUBLE) / CAST(trace6 AS DOUBLE)
         |    + 0.5) AS BIGINT) AS share4
         |FROM v$iters CROSS JOIN scal
         |ORDER BY pos""".stripMargin) { (s, dir) =>
      graft.operators.Embeddings.pcaTopComponent(
          Tables.embeddings(s, dir).where(col("label") === 0),
          "embedding", Dim, iters)
        .orderBy(col("pos"))
    }
  }

  /** Per-label census of projections onto the q267 component: every
    * embedding's exact integer dot with the learned loading vector
    * (`p6 = ⌊Σ x6·v6 / 10⁶ + 0.5⌋` — one zero-shuffle map), grouped by
    * label — does the corpus's dominant variance direction SEPARATE
    * the labels, i.e. is one linear feature already a weak classifier?
    * The component is trained on the label-0 slice only, so the other
    * labels are out-of-sample. The oracle replays the whole q267
    * ladder (shared CTE text — the components cannot drift apart) and
    * then the projection join. */
  val q268 = GQuery("q268_pca_projection",
    s"""WITH ${pcaCtes(PcaIters)},
       |xa AS MATERIALIZED (
       |  SELECT vec_id, u.pos AS pos, u.x6 AS x6 FROM (
       |    SELECT vec_id, unnest([{'pos': i - 1,
       |      'x6': CAST(floor(CAST(embedding[i] AS DOUBLE) * 1e6 + 0.5)
       |        AS BIGINT)} for i in range(1, ${Dim + 1})]) AS u
       |    FROM embeddings)),
       |p AS (
       |  SELECT xa.vec_id,
       |    CAST(floor(CAST(sum(xa.x6 * vv.v) AS DOUBLE) / 1e6 + 0.5)
       |      AS BIGINT) AS p6
       |  FROM xa JOIN v$PcaIters vv ON vv.pos = xa.pos
       |  GROUP BY xa.vec_id)
       |SELECT e.label, CAST(count(*) AS BIGINT) AS n_vecs,
       |  CAST(round(avg(p6)) AS BIGINT) AS mean_p6,
       |  min(p6) AS min_p6, max(p6) AS max_p6
       |FROM p JOIN embeddings e ON e.vec_id = p.vec_id
       |GROUP BY e.label ORDER BY e.label""".stripMargin) { (s, dir) =>
    import s.implicits._
    val v6 = graft.operators.Embeddings.pcaTopComponent(
        Tables.embeddings(s, dir).where(col("label") === 0),
        "embedding", Dim, PcaIters)
      .orderBy(col("pos")).select(col("loading6")).as[Long].collect()
    val vLit = typedLit(v6.toSeq)
    val t = aggregate(
      zip_with(
        transform(col("embedding"),
          x => floor(x.cast("double") * 1e6 + lit(0.5)).cast("long")),
        vLit, (a, b) => a * b),
      lit(0L), (acc, x) => acc + x)
    Tables.embeddings(s, dir)
      .select(col("label"),
        floor(t.cast("double") / 1e6 + lit(0.5)).cast("long").as("p6"))
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n_vecs"),
        round(avg(col("p6"))).cast("long").as("mean_p6"),
        min(col("p6")).as("min_p6"), max(col("p6")).as("max_p6"))
      .orderBy(col("label"))
  }

  /** Top-2 principal components with grid deflation (see
    * [[graft.operators.Embeddings.pcaComponents]]): after component 1,
    * `cov6 ← cov6 − ⌊eig6·v6ᵢ·v6ⱼ/10¹² + 0.5⌋` (Hotelling deflation as
    * integer-matrix arithmetic) and a second 20-rung ladder extracts
    * the runner-up direction. Orthogonality and the spectral ordering
    * are spec-asserted; the oracle replays BOTH ladders and the
    * deflation cell-for-cell. Two components' shares bound what any
    * 2-d visualization/compression of these embeddings can preserve. */
  val q271 = {
    val iters = PcaIters
    val ladder2 = (1 to iters).map { t =>
      s"""uw$t AS MATERIALIZED (
         |  SELECT pi AS pos, CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
         |    AS w
         |  FROM cov2 JOIN u${t - 1} vv ON vv.pos = cov2.pj GROUP BY pi),
         |un$t AS (SELECT CAST(sum(w * w) AS HUGEINT) AS n2 FROM uw$t),
         |u$t AS MATERIALIZED (
         |  SELECT pos, CAST(floor(1e6 * CAST(w AS DOUBLE)
         |    / sqrt(CAST(n2 AS DOUBLE)) + 0.5) AS BIGINT) AS v
         |  FROM uw$t, un$t)""".stripMargin
    }.mkString(",\n")
    GQuery("q271_pca_two_components",
      s"""WITH ${pcaCtes(iters)},
         |wf AS MATERIALIZED (
         |  SELECT pi AS pos, CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
         |    AS w
         |  FROM cov JOIN v$iters vv ON vv.pos = cov.pj GROUP BY pi),
         |ray AS (
         |  SELECT CAST(sum(CAST(v AS HUGEINT) * w) AS HUGEINT) AS r,
         |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS d
         |  FROM v$iters JOIN wf USING (pos)),
         |tr AS (SELECT CAST(sum(c) AS BIGINT) AS trace6 FROM cov
         |       WHERE pi = pj),
         |scal AS (
         |  SELECT CAST(floor(CAST(r AS DOUBLE) / CAST(d AS DOUBLE) + 0.5)
         |      AS BIGINT) AS eig6
         |  FROM ray),
         |cov2 AS MATERIALIZED (
         |  SELECT cov.pi AS pi, cov.pj AS pj,
         |    cov.c - CAST(floor(CAST(CAST(s.eig6 AS HUGEINT) * va.v * vb.v
         |      AS DOUBLE) / 1e12 + 0.5) AS BIGINT) AS c
         |  FROM cov JOIN v$iters va ON va.pos = cov.pi
         |  JOIN v$iters vb ON vb.pos = cov.pj, scal s),
         |u0 AS (SELECT pos,
         |  CAST(floor(1e6 / sqrt(${Dim}.0) + 0.5) AS BIGINT) AS v
         |  FROM sums),
         |$ladder2,
         |wf2 AS MATERIALIZED (
         |  SELECT pi AS pos, CAST(sum(CAST(c AS HUGEINT) * v) AS HUGEINT)
         |    AS w
         |  FROM cov2 JOIN u$iters vv ON vv.pos = cov2.pj GROUP BY pi),
         |ray2 AS (
         |  SELECT CAST(sum(CAST(v AS HUGEINT) * w) AS HUGEINT) AS r,
         |    CAST(sum(CAST(v AS HUGEINT) * v) AS HUGEINT) AS d
         |  FROM u$iters JOIN wf2 USING (pos)),
         |scal2 AS (
         |  SELECT CAST(floor(CAST(r AS DOUBLE) / CAST(d AS DOUBLE) + 0.5)
         |      AS BIGINT) AS eig6
         |  FROM ray2)
         |SELECT * FROM (
         |  SELECT CAST(0 AS INT) AS component, CAST(pos AS INT) AS pos,
         |    v AS loading6, s.eig6, t.trace6,
         |    CAST(floor(1e4 * CAST(s.eig6 AS DOUBLE)
         |      / CAST(t.trace6 AS DOUBLE) + 0.5) AS BIGINT) AS share4
         |  FROM v$iters, scal s, tr t
         |  UNION ALL
         |  SELECT CAST(1 AS INT), CAST(pos AS INT), v, s2.eig6, t.trace6,
         |    CAST(floor(1e4 * CAST(s2.eig6 AS DOUBLE)
         |      / CAST(t.trace6 AS DOUBLE) + 0.5) AS BIGINT)
         |  FROM u$iters, scal2 s2, tr t)
         |ORDER BY component, pos""".stripMargin) { (s, dir) =>
      graft.operators.Embeddings.pcaComponents(
          Tables.embeddings(s, dir).where(col("label") === 0),
          "embedding", Dim, nComp = 2, iters)
        .orderBy(col("component"), col("pos"))
    }
  }

  /** k-NN label accuracy over the embedding space: for 200 query
    * vectors, the 5 exact cosine neighbors (self excluded) vote on the
    * label — majority with (count DESC, label) tie-break — and the
    * census reports per-true-label accuracy on the 1e-4 grid. The
    * standard embedding-quality probe ("do nearest neighbors share
    * labels?") with the same bit-identical unrolled-cosine contract as
    * q31; at corpus scale the brute scorer swaps for [[Similarity
    * .ivfProbe]] candidates and the vote/census stages are unchanged
    * (query-set-sized). */
  val q312 = {
    val nq = 200
    GQuery("q312_knn_accuracy",
      s"""WITH q AS (SELECT vec_id AS query_id, embedding AS qv,
         |             label AS truth
         |           FROM embeddings WHERE vec_id < $nq),
         |c AS (SELECT vec_id AS corpus_id, embedding AS cv, label
         |      FROM embeddings),
         |scored AS (
         |  SELECT query_id, corpus_id, round($cosSql, 6) AS cosine
         |  FROM q, c WHERE corpus_id <> query_id),
         |rk AS (
         |  SELECT query_id, corpus_id,
         |    row_number() OVER (PARTITION BY query_id
         |      ORDER BY cosine DESC, corpus_id) AS rn
         |  FROM scored),
         |votes AS (
         |  SELECT t.query_id, c.label, count(*) AS nv
         |  FROM rk t JOIN c USING (corpus_id) WHERE t.rn <= 5
         |  GROUP BY 1, 2),
         |pred AS (
         |  SELECT query_id, label AS pred FROM (
         |    SELECT query_id, label,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY nv DESC, label) AS r
         |    FROM votes) WHERE r = 1)
         |SELECT q.truth, CAST(count(*) AS BIGINT) AS n,
         |  CAST(sum(CASE WHEN p.pred = q.truth THEN 1 ELSE 0 END)
         |    AS BIGINT) AS n_correct,
         |  CAST((2 * 10000 * sum(CASE WHEN p.pred = q.truth THEN 1
         |      ELSE 0 END) + count(*)) // (2 * count(*)) AS BIGINT)
         |    AS acc4
         |FROM pred p JOIN q USING (query_id)
         |GROUP BY 1 ORDER BY q.truth""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val lbl = emb.select(col("vec_id"), col("label"))
      val knn = Similarity.bruteForceTopK(
        corpus = emb, queries = emb.filter(col("vec_id") < nq),
        idCol = "vec_id", vecCol = "embedding", k = 5, dim = Dim)
      val votes = knn
        .join(lbl.withColumnRenamed("vec_id", "corpus_id"), "corpus_id")
        .groupBy(col("query_id"), col("label"))
        .agg(count(lit(1)).as("nv"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id"))
        .orderBy(col("nv").desc, col("label"))
      val pred = votes.withColumn("r", row_number().over(w))
        .where(col("r") === 1)
        .select(col("query_id"), col("label").as("pred"))
      pred
        .join(lbl.select(col("vec_id").as("query_id"),
          col("label").as("truth")), "query_id")
        .groupBy(col("truth"))
        .agg(count(lit(1)).as("n"),
          sum(when(col("pred") === col("truth"), 1L).otherwise(0L))
            .as("n_correct"))
        .select(col("truth"), col("n"), col("n_correct"),
          expr("(2 * 10000 * n_correct + n) div (2 * n)").as("acc4"))
        .orderBy(col("truth"))
    }
  }

  /** Quantization-loss recall audit: for 100 queries, the top-5 by
    * EXACT float cosine (the q31 contract) vs the top-5 by pure
    * INTEGER dot product over symmetric-int8 vectors (the q55
    * transform, exact in both engines) — reported as a recall
    * histogram (n_hits ∈ 0..5 → query count). The readout every
    * int8-serving decision needs: how many exact neighbors does the
    * integer index keep? Integer ranking ties break on corpus_id, so
    * the whole comparison is hash-exact; at corpus scale both sides
    * swap brute scoring for IVF candidates unchanged. */
  val q323 = {
    val nq = 100
    GQuery("q323_int8_recall",
      s"""WITH mx AS (
         |  SELECT vec_id, embedding,
         |    list_max(list_transform(embedding,
         |      x -> abs(CAST(x AS DOUBLE)))) AS maxabs
         |  FROM embeddings),
         |qv AS (
         |  SELECT vec_id,
         |    list_transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE)
         |      * (CASE WHEN maxabs > 0 THEN 127.0 / maxabs ELSE 0.0 END)
         |      + 0.5) AS BIGINT)) AS q
         |  FROM mx),
         |qq AS (SELECT vec_id AS query_id, q AS qa FROM qv
         |  WHERE vec_id < $nq),
         |cc AS (SELECT vec_id AS corpus_id, q AS qb FROM qv),
         |qdot AS (
         |  SELECT query_id, corpus_id,
         |    ${(1 to Dim).map(i => s"qa[$i] * qb[$i]").mkString(" + ")}
         |      AS dq
         |  FROM qq, cc WHERE corpus_id <> query_id),
         |qtop AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY dq DESC, corpus_id) AS rn
         |    FROM qdot) WHERE rn <= 5),
         |fq AS (SELECT vec_id AS query_id, embedding AS qv2
         |  FROM embeddings WHERE vec_id < $nq),
         |fc AS (SELECT vec_id AS corpus_id, embedding AS cv
         |  FROM embeddings),
         |ftop AS (
         |  SELECT query_id, corpus_id FROM (
         |    SELECT query_id, corpus_id,
         |      row_number() OVER (PARTITION BY query_id
         |        ORDER BY cosine DESC, corpus_id) AS rn
         |    FROM (
         |      SELECT query_id, corpus_id,
         |        round(${VectorFunctions.cosineSql("qv2", "cv", Dim)}, 6)
         |          AS cosine
         |      FROM fq, fc WHERE corpus_id <> query_id))
         |  WHERE rn <= 5),
         |hits AS (
         |  SELECT query_id, CAST(count(*) AS BIGINT) AS n_hits
         |  FROM ftop JOIN qtop USING (query_id, corpus_id) GROUP BY 1)
         |SELECT n_hits, CAST(count(*) AS BIGINT) AS n_queries FROM (
         |  SELECT f.query_id, coalesce(h.n_hits, 0) AS n_hits
         |  FROM (SELECT DISTINCT query_id FROM ftop) f
         |  LEFT JOIN hits h USING (query_id))
         |GROUP BY 1 ORDER BY n_hits""".stripMargin) { (s, dir) =>
      val emb = Tables.embeddings(s, dir)
      val qv = graft.operators.Embeddings
        .quantizeInt8Vec(emb, "vec_id", "embedding")
      val qq = qv.where(col("vec_id") < nq)
        .select(col("vec_id").as("query_id"), col("q").as("qa"))
      val cc = qv.select(col("vec_id").as("corpus_id"), col("q").as("qb"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("query_id")).orderBy(col("dq").desc, col("corpus_id"))
      val qtop = cc.join(broadcast(qq), col("corpus_id") =!= col("query_id"))
        .select(col("query_id"), col("corpus_id"),
          aggregate(zip_with(col("qa"), col("qb"), _ * _),
            lit(0L), _ + _).as("dq"))
        .withColumn("rn", row_number().over(w))
        .where(col("rn") <= 5)
        .select("query_id", "corpus_id")
      val ftop = Similarity.bruteForceTopK(
          corpus = emb, queries = emb.filter(col("vec_id") < nq),
          idCol = "vec_id", vecCol = "embedding", k = 5, dim = Dim)
        .select("query_id", "corpus_id")
      val hits = ftop.join(qtop, Seq("query_id", "corpus_id"))
        .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
      ftop.select(col("query_id")).distinct()
        .join(hits, Seq("query_id"), "left")
        .select(coalesce(col("n_hits"), lit(0L)).as("n_hits"))
        .groupBy(col("n_hits")).agg(count(lit(1)).as("n_queries"))
        .orderBy(col("n_hits"))
    }
  }

  val all: Seq[GQuery] =
    Seq(q31, q31b, q32, q32b, q33, q55, q61, q62, q66, q72, q74, q95, q97,
      q99, q101, q109, q124, q125, q130, q140, q141, q152, q230, q231,
      q248, q254, q260, q267, q268, q271, q312, q323)
}
