package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search over embedding columns (`array<float>`).
  *
  * Two paths:
  *  - [[bruteForceTopK]] — exact: broadcast the (small) query set against
  *    the full corpus; O(N·Q) dot products, no shuffle until the final
  *    per-query top-k. This is the oracle/ground-truth path.
  *  - [[signLshTopK]] — approximate: both sides bucketed by a
  *    deterministic sign-bit quantizer; candidates restricted to the
  *    query's bucket. At 100 TB the corpus is bucketed ONCE (write-time
  *    partitioning on the bucket), so a query touches 1/2^bits of data.
  */
object Similarity {

  /** Exact top-k cosine neighbors per query vector.
    * @param corpus  (idCol, vecCol) frame — the big side
    * @param queries (idCol, vecCol) frame — small, gets broadcast
    */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame,
                     idCol: String, vecCol: String,
                     k: Int, dim: Int, excludeSelf: Boolean = true): DataFrame = {
    val c = FanOut(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val pairs = c.join(broadcast(q),
      if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = pairs.withColumn("cosine",
      round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** Hard-negative mining for contrastive training: per query, the
    * top-k most-similar corpus vectors with a DIFFERENT label — the
    * negatives that actually move the loss. Same broadcast + per-query
    * window shape as [[bruteForceTopK]] with the label inequality
    * pushed into the join condition, so same-label pairs are pruned
    * before any dot product is computed. At scale, swap the broadcast
    * brute-force stage for [[ivfProbe]] candidates and keep the label
    * filter + window unchanged. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
                    idCol: String, vecCol: String, labelCol: String,
                    k: Int): DataFrame = {
    val c = FanOut(corpus.select(col(idCol).as("corpus_id"),
      col(vecCol).as("cv"), col(labelCol).as("c_label")))
    val q = queries.select(col(idCol).as("query_id"),
      col(vecCol).as("qv"), col(labelCol).as("q_label"))
    val pairs = c.join(broadcast(q), col("c_label") =!= col("q_label"))
    val scored = pairs.withColumn("cosine",
      round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** Approximate top-k: only corpus vectors in the query's sign-LSH
    * bucket are scored. Deterministic (no RNG), so results are exactly
    * reproducible in any engine. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  k: Int, dim: Int, bits: Int = 8,
                  excludeSelf: Boolean = true): DataFrame = {
    val c = FanOut(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket")))
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      signBucket(col(vecCol), bits).as("bucket"))
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = pairs.withColumn("cosine",
      round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** Multi-probe variant of [[signLshTopK]]: each query also probes every
    * bucket at Hamming distance 1 from its own (bits+1 probes total),
    * recovering most boundary-crossing neighbors for ~(bits+1)× the
    * candidate volume — still a bucket-equi-join, still ~N·(bits+1)/2^bits
    * of the corpus per query instead of all of it. */
  def signLshTopKMultiProbe(corpus: DataFrame, queries: DataFrame,
                            idCol: String, vecCol: String,
                            k: Int, dim: Int, bits: Int = 8,
                            excludeSelf: Boolean = true): DataFrame = {
    val c = FanOut(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket")))
    val flips = (0 until bits).map { i =>
      val pre = if (i > 0) substring(col("b0"), 1, i) else lit("")
      val bit = when(substring(col("b0"), i + 1, 1) === "1", "0").otherwise("1")
      val post = if (i < bits - 1) substring(col("b0"), i + 2, bits - i - 1) else lit("")
      concat(pre, bit, post)
    }
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
        signBucket(col(vecCol), bits).as("b0"))
      .withColumn("bucket", explode(array(col("b0") +: flips: _*)))
      .drop("b0")
    val pairs = c.join(broadcast(q), Seq("bucket"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = pairs.withColumn("cosine",
      round(cosine(col("qv"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** IVF (inverted-file) approximate top-k: learn `nlist` centroids with
    * a few deterministic Lloyd iterations, assign every corpus vector to
    * its nearest centroid (the inverted list), and let each query score
    * only the lists of its `nprobe` nearest centroids — ~nprobe/nlist of
    * the corpus per query instead of all of it.
    *
    * Scale shape: training touches only a hash-sample (`trainMod` keeps
    * 1/trainMod of the corpus); each Lloyd step is one broadcast join +
    * one (cluster, dim) aggregate; only the nlist×dim centroid matrix is
    * ever collected (same driver footprint as any k-means impl). The
    * corpus is assigned ONCE — at 100 TB you'd persist the assignment as
    * a partitioned table and reuse it across query batches. Probing is a
    * broadcast equi-join on the centroid id.
    *
    * Deterministic: seeding is by md5(id) order, iteration count fixed,
    * per-dimension means rounded to 6 dp so float summation order cannot
    * flip an assignment. Learned centroids adapt to clustered real-world
    * embeddings where fixed sign-planes cannot. */
  def ivfTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              k: Int, dim: Int, nlist: Int = 16, nprobe: Int = 4,
              iters: Int = 5, trainMod: Int = 1,
              excludeSelf: Boolean = true): DataFrame = {
    val centroids = ivfTrain(corpus, idCol, vecCol, nlist, iters, trainMod)
    ivfProbe(ivfAssign(corpus, idCol, vecCol, centroids), centroids,
      queries, idCol, vecCol, k, nprobe, excludeSelf)
  }

  private def dist2(v: Column, cent: Column): Column =
    aggregate(zip_with(v, cent, (a, b) => (a - b) * (a - b)),
      lit(0.0), (acc, x) => acc + x)

  // Centroids live driver-side between steps (an nlist×dim matrix, the
  // k-means state every implementation keeps), so nearest-centroid
  // assignment is a PURE MAP: an argmin over literal centroid vectors —
  // array_min over (d2, cid) structs — with no join, no window, and no
  // shuffle of the vector column. Ties break to the smaller cid.
  private def distStructs(v: Column, cents: Array[(Int, Array[Double])]): Column =
    array(cents.toIndexedSeq.map { case (cid, cent) =>
      struct(dist2(v, typedLit(cent.toSeq)).as("d2"), lit(cid).as("cid"))
    }: _*)

  /** Train IVF centroids: deterministic Lloyd k-means (md5-ordered
    * seeding, fixed iteration count, 6-dp-rounded means so float
    * summation order cannot flip an assignment). Returns the nlist×dim
    * centroid matrix — the persistable "index model": at scale, train
    * once on a hash-sample, store the matrix, and reuse it across every
    * query batch and incremental corpus assignment. */
  def ivfTrain(corpus: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, iters: Int = 5,
               trainMod: Int = 1): Array[(Int, Array[Double])] = {
    val spark = corpus.sparkSession
    val c = FanOut(corpus.select(col(idCol).as("corpus_id"),
      transform(col(vecCol), _.cast("double")).as("cv")))
    // Persist the training sample: seeding + every Lloyd iteration is its
    // own job, and without this each one re-scans and re-casts the source
    // (iters+1 full reads). The sample is the k-means working set every
    // real IVF build holds resident; released before returning.
    val train = (if (trainMod > 1)
      c.where(pmod(abs(hash(col("corpus_id"))), lit(trainMod)) === 0) else c)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // deterministic seeding: the nlist vectors with smallest md5(id)
    import spark.implicits._
    var centroids: Array[(Int, Array[Double])] = train
      .withColumn("h", md5(col("corpus_id").cast("string")))
      .orderBy("h").limit(nlist)
      .select(col("h"), col("cv")).as[(String, Seq[Double])].collect()
      .sortBy(_._1).zipWithIndex
      .map { case ((_, v), i) => (i, v.toArray) }
    for (_ <- 1 to iters) {
      val assigned = train.withColumn("cid",
        array_min(distStructs(col("cv"), centroids)).getField("cid"))
      // per-dimension mean, rounded so summation order can't leak in.
      // ONE shuffle per iteration: collect the (cid, pos, mean) cells
      // (nlist×dim rows — same driver-side footprint as the centroid
      // matrix itself) and assemble arrays here instead of a second
      // groupBy+collect_list job.
      val cells = assigned
        .select(col("cid"), posexplode(col("cv")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(round(avg(col("x")), 6).as("m"))
        .as[(Int, Int, Double)].collect()
      centroids = cells.groupBy(_._1).toArray.sortBy(_._1)
        .map { case (cid, xs) => (cid, xs.sortBy(_._2).map(_._3)) }
    }
    train.unpersist(blocking = false)
    centroids
  }

  /** Assign every corpus vector to its nearest centroid — the inverted
    * list build, (corpus_id, cv, cid). Pure map, no shuffle: at 100 TB
    * this frame is written ONCE as a table partitioned by `cid` and read
    * back per query batch instead of recomputed. */
  def ivfAssign(corpus: DataFrame, idCol: String, vecCol: String,
                centroids: Array[(Int, Array[Double])]): DataFrame =
    FanOut(corpus.select(col(idCol).as("corpus_id"),
      transform(col(vecCol), _.cast("double")).as("cv")))
      .withColumn("cid", array_min(distStructs(col("cv"), centroids)).getField("cid"))
      .select(col("corpus_id"), col("cv"), col("cid"))

  /** Probe a built IVF index: each query scores only the inverted lists
    * of its `nprobe` nearest centroids (a broadcast equi-join on cid —
    * ~nprobe/nlist of the corpus per query). */
  def ivfProbe(indexed: DataFrame, centroids: Array[(Int, Array[Double])],
               queries: DataFrame, idCol: String, vecCol: String,
               k: Int, nprobe: Int = 4,
               excludeSelf: Boolean = true): DataFrame = {
    require(nprobe <= centroids.length, "nprobe must be ≤ nlist")
    val q = queries.select(col(idCol).as("query_id"),
      transform(col(vecCol), _.cast("double")).as("qv0"))
    // nprobe nearest centroids per query: sort the same literal distance
    // array, slice, explode — again a pure map
    val probes = q
      .withColumn("pc", explode(slice(
        array_sort(distStructs(col("qv0"), centroids)), 1, nprobe)))
      .select(col("query_id"), col("qv0"), col("pc.cid").as("cid"))
    val pairs = indexed.join(broadcast(probes), Seq("cid"))
      .where(if (excludeSelf) col("corpus_id") =!= col("query_id") else lit(true))
    val scored = pairs.withColumn("cosine",
      round(cosine(col("qv0"), col("cv")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cosine").desc, col("corpus_id"))
    scored.withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("query_id"), col("corpus_id"), col("cosine"), col("rn"))
  }

  /** Maximal Marginal Relevance (MMR) diversity re-rank: from each
    * query's top-`m` candidate pool, greedily pick `k` maximizing
    * λ·relevance − (1−λ)·max-cosine-to-already-picked — the standard
    * diversity selection for curation/retrieval (near-identical
    * candidates stop crowding out coverage).
    *
    * Scale shape: the pool per query is small by construction (m in the
    * tens-hundreds, from any top-k operator), so the greedy O(k·m·dim)
    * loop is a per-ROW typed map over (query, pooled candidates) —
    * embarrassingly parallel across queries, no shuffle beyond the pool
    * collect. This is the one genuinely imperative per-row computation
    * in the similarity family, hence a typed Dataset map rather than a
    * Column expression. Deterministic: ties break to smaller corpus_id.
    */
  def mmrTopK(corpus: DataFrame, queries: DataFrame,
              idCol: String, vecCol: String,
              k: Int, m: Int, dim: Int, lambda: Double = 0.7,
              excludeSelf: Boolean = true): DataFrame = {
    require(k <= m, "k must be ≤ m (the candidate pool size)")
    require(lambda >= 0 && lambda <= 1, "lambda must be in [0, 1]")
    val spark = corpus.sparkSession
    import spark.implicits._
    // ids cast to long and vectors to array<double> so the typed encoder
    // below accepts ANY integral id / float-or-double vector input (the
    // IVF family hands around array<double>) instead of imposing an
    // undocumented Long/Float contract on callers
    val pool = bruteForceTopK(corpus, queries, idCol, vecCol, m, dim, excludeSelf)
      .join(corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv")), "corpus_id")
      .groupBy(col("query_id").cast("long").as("query_id"))
      .agg(array_sort(collect_list(struct(
        col("rn"), col("corpus_id").cast("long").as("corpus_id"), col("cosine"),
        transform(col("cv"), _.cast("double")).as("cv")))).as("cands"))
      .as[(Long, Seq[(Int, Long, Double, Seq[Double])])]
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length && i < b.length) {
        val x = a(i); val y = b(i)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0 && nb == 0) 1.0 else if (na == 0 || nb == 0) 0.0
      else dot / math.sqrt(na * nb)
    }
    pool.flatMap { case (qid, cands) =>
      val remaining = scala.collection.mutable.ArrayBuffer(cands: _*)
      val picked = Seq.newBuilder[(Long, Long, Double, Int)]
      val pickedVecs = scala.collection.mutable.ArrayBuffer.empty[Seq[Double]]
      var rank = 1
      while (rank <= k && remaining.nonEmpty) {
        val best = remaining.minBy { case (_, cid, rel, cv) =>
          val penalty =
            if (pickedVecs.isEmpty) 0.0
            else pickedVecs.iterator.map(pv => cos(cv, pv)).max
          (-(lambda * rel - (1 - lambda) * penalty), cid)   // max score, min id
        }
        picked += ((qid, best._2,
          math.rint((lambda * best._3 - (1 - lambda) * (if (pickedVecs.isEmpty) 0.0
            else pickedVecs.iterator.map(pv => cos(best._4, pv)).max)) * 1e6) / 1e6,
          rank))
        pickedVecs += best._4
        remaining -= best
        rank += 1
      }
      picked.result()
    }.toDF("query_id", "corpus_id", "mmr_score", "rank")
  }

  /** Exact near-duplicate pairs by embedding cosine ≥ threshold, via the
    * bucket join (both sides same corpus). Approximate recall (pairs
    * crossing a bucket boundary are missed) — the embedding-space analog
    * of MinHash candidate generation. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double, bits: Int = 8): DataFrame = {
    val c = FanOut(corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket")))
    c.select(col("id").as("id_a"), col("v").as("va"), col("bucket"))
      .join(c.select(col("id").as("id_b"), col("v").as("vb"), col("bucket")), Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }

  /** SemDeDup (Abbas et al. 2023, arXiv:2303.09540): embedding-space
    * semantic dedup. Cluster with the IVF k-means ([[ivfTrain]] /
    * [[ivfAssign]]), then within each cluster evict every vector that
    * has a same-cluster neighbor with cosine ≥ `tau` and a smaller id
    * (deterministic min-id representative — single pass, no iteration;
    * the paper's keep-one-per-ε-group with a fixed tie-break). Returns
    * every vector as (vec_id, cid, kept).
    *
    * 100 TB story: pairwise work is confined within clusters — the
    * candidate join is keyed on cid, so total compare cost is
    * Σ|cluster|² with nlist sized ∝ N to bound cluster sizes (the
    * paper's setting; k-means balance keeps the cid shuffle from
    * skewing). The assignment frame feeds three consumers, so it is
    * persisted; Spark's CacheManager dedups plan-identical persists —
    * same caller-owned lifecycle as [[Dedup.jaccardPairs]]. */
  def semDedup(emb: DataFrame, idCol: String, vecCol: String,
               nlist: Int = 16, iters: Int = 5, tau: Double = 0.97,
               trainMod: Int = 1): DataFrame = {
    val centroids = ivfTrain(emb, idCol, vecCol, nlist, iters, trainMod)
    semDedupAssigned(
      ivfAssign(emb, idCol, vecCol, centroids)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK),
      tau)
  }

  /** [[semDedup]] over a pre-built [[ivfAssign]] frame
    * (corpus_id, cv, cid) — the caller owns the index lifecycle (a
    * pipeline trains/assigns once per corpus and both the ANN and the
    * semantic-dedup passes read the same stored index). */
  def semDedupAssigned(assigned: DataFrame, tau: Double): DataFrame = {
    val a = assigned.select(col("cid"), col("corpus_id").as("id_a"),
      col("cv").as("va"))
    val b = assigned.select(col("cid"), col("corpus_id").as("id_b"),
      col("cv").as("vb"))
    val evicted = a.join(b, Seq("cid"))
      .where(col("id_b") < col("id_a"))
      .where(round(cosine(col("va"), col("vb")), 6) >= tau)
      .select(col("id_a")).distinct()
    assigned.join(evicted,
        assigned("corpus_id") === evicted("id_a"), "left_outer")
      .select(col("corpus_id").as("vec_id"), col("cid"),
        col("id_a").isNull.as("kept"))
  }
}
