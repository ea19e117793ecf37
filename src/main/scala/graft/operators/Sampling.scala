package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable sampling for training-data pipelines.
  *
  * Instead of RNG-based `sample()` (irreproducible across engines,
  * partitionings, and reruns), rows are assigned to buckets by an md5
  * hash of a stable key. The same row lands in the same bucket in any
  * engine, any run, any partitioning — which is what makes
  * train/test splits auditable and joins between separately-sampled
  * datasets consistent at 100 TB (sample once per KEY, not per row
  * occurrence: all rows of a key travel together).
  */
object Sampling {

  /** Hash bucket in [0, buckets) from the first 4 hex chars of
    * md5(key). */
  def hashBucket(key: Column, buckets: Int): Column =
    (conv(substring(md5(key.cast("string")), 1, 4), 16, 10).cast("int") % buckets)

  /** DuckDB SQL for the same bucket. */
  def hashBucketSql(key: String, buckets: Int): String =
    s"(('0x' || substr(md5(CAST($key AS VARCHAR)), 1, 4))::INT % $buckets)"

  /** Keep ~pct% of keys, deterministically. */
  def deterministicSample(df: DataFrame, keyCol: String, pct: Int): DataFrame = {
    require(pct >= 0 && pct <= 100)
    df.where(hashBucket(col(keyCol), 100) < pct)
  }

  /** Add a `split` column: "test" for ~testPct% of keys, else "train". */
  def trainTestSplit(df: DataFrame, keyCol: String, testPct: Int): DataFrame =
    df.withColumn("split",
      when(hashBucket(col(keyCol), 100) < testPct, "test").otherwise("train"))

  /** Stratified deterministic sample: per-stratum percentage keep. */
  def stratifiedSample(df: DataFrame, keyCol: String, stratumCol: String,
                       pctByStratum: Map[String, Int],
                       defaultPct: Int = 0): DataFrame = {
    val pctCol = pctByStratum.foldLeft(lit(defaultPct)) {
      case (acc, (s, p)) => when(col(stratumCol) === s, p).otherwise(acc)
    }
    df.where(hashBucket(col(keyCol), 100) < pctCol)
  }
}
