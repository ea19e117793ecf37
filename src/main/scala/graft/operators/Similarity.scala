package graft.operators

import graft.functions.VectorFunctions._
import org.apache.spark.sql.DataFrame
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
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"))
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

  /** Approximate top-k: only corpus vectors in the query's sign-LSH
    * bucket are scored. Deterministic (no RNG), so results are exactly
    * reproducible in any engine. */
  def signLshTopK(corpus: DataFrame, queries: DataFrame,
                  idCol: String, vecCol: String,
                  k: Int, dim: Int, bits: Int = 8,
                  excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
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
    val c = corpus.select(col(idCol).as("corpus_id"), col(vecCol).as("cv"),
      signBucket(col(vecCol), bits).as("bucket"))
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

  /** Exact near-duplicate pairs by embedding cosine ≥ threshold, via the
    * bucket join (both sides same corpus). Approximate recall (pairs
    * crossing a bucket boundary are missed) — the embedding-space analog
    * of MinHash candidate generation. */
  def cosineNearDupPairs(corpus: DataFrame, idCol: String, vecCol: String,
                         dim: Int, threshold: Double, bits: Int = 8): DataFrame = {
    val c = corpus.select(col(idCol).as("id"), col(vecCol).as("v"),
      signBucket(col(vecCol), bits).as("bucket"))
    c.select(col("id").as("id_a"), col("v").as("va"), col("bucket"))
      .join(c.select(col("id").as("id_b"), col("v").as("vb"), col("bucket")), Seq("bucket"))
      .where(col("id_a") < col("id_b"))
      .withColumn("cosine", round(cosine(col("va"), col("vb")), 6))
      .where(col("cosine") >= threshold)
      .select(col("id_a"), col("id_b"), col("cosine"))
  }
}
