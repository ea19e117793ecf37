package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for LLM pretraining shards: concatenate documents in
  * a deterministic hash-shuffled order and cut every `maxTokens` — the
  * standard concat-and-chunk packing. Each document's shard is
  * `floor(start_offset / maxTokens)` where `start_offset` is the global
  * running token count before the document.
  *
  * The md5 ordering doubles as the training-data shuffle: it interleaves
  * sources/languages uniformly, reproducibly, with no RNG state.
  *
  * Scale design — the global cumulative sum is NOT computed with a
  * global (single-partition) window. It is the classic two-phase
  * distributed prefix sum:
  *   1. range-partition + sort by the hash key (parallel sort),
  *   2. running sum WITHIN each partition (parallel windows),
  *   3. per-partition totals (a tiny frame, one row per partition)
  *      prefix-summed and broadcast back as offsets.
  * Token counts are integers, so the two-phase sum is bit-identical to a
  * sequential pass in any engine — which is what the DuckDB oracle
  * checks.
  */
object Packing {

  /** Assign each row a `shard_id` by token-budget packing.
    *
    * @param tokenCol integer token count per document
    * @param parts    range partitions for the distributed sort — on a
    *                 real cluster ~2-3× total cores
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        maxTokens: Long, parts: Int = 32): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val keyed = df
      .withColumn("__h", md5(col(idCol).cast("string")))
      .repartitionByRange(parts, col("__h"))
      .sortWithinPartitions("__h")
      .withColumn("__pid", spark_partition_id())

    // per-partition token totals → exclusive prefix offsets (tiny frame:
    // one row per partition; the window over it is trivially cheap)
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = keyed.groupBy(col("__pid"))
      .agg(sum(col(tokenCol)).as("__ptot"))
      .withColumn("__offset", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))

    val wIn = Window.partitionBy(col("__pid")).orderBy(col("__h"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    keyed
      .join(broadcast(offsets), "__pid")
      .withColumn("__start",
        col("__offset") + coalesce(sum(col(tokenCol)).over(wIn), lit(0L)))
      .withColumn("shard_id", floor(col("__start") / maxTokens))
      .drop("__h", "__pid", "__offset", "__start")
  }

  /** DuckDB SQL fragment computing the same shard id with a sequential
    * window (`exprs` must use the same idCol/tokenCol names). */
  def shardIdSql(idCol: String, tokenCol: String, maxTokens: Long): String =
    s"""CAST(floor((sum($tokenCol) OVER (ORDER BY md5(CAST($idCol AS VARCHAR))
       | ROWS UNBOUNDED PRECEDING) - $tokenCol) / $maxTokens) AS BIGINT)"""
      .stripMargin.replace("\n", "")

  /** Per-shard packing summary: document count, token sum, fill ratio. */
  def shardSummary(packed: DataFrame, tokenCol: String,
                   maxTokens: Long): DataFrame =
    packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("sum_tokens"))
      .withColumn("fill_ratio",
        round(col("sum_tokens").cast("double") / maxTokens, 4))
}
