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
                        maxTokens: Long, parts: Int = 32,
                        keepStart: Boolean = false): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val keyed = df
      .withColumn("__t", col(tokenCol).cast("long"))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .repartitionByRange(parts, col("__h"))
      .sortWithinPartitions("__h")
      .withColumn("__pid", spark_partition_id())
    val out = runningStart(keyed)
      .withColumn("shard_id", floor(col("__start") / maxTokens))
      .drop("__t", "__h", "__pid", "__offset")
    if (keepStart) out else out.drop("__start")
  }

  /** The two-phase distributed prefix sum (see object doc). `keyed`
    * must already be range-partitioned AND sorted in the intended global
    * order, carrying `__t` (long value) and `__pid`
    * (spark_partition_id()); appends `__start`, the exclusive global
    * running sum, without ever forming a single-partition window.
    *
    * Per-partition totals are map-side partial-aggregated (one row per
    * partition), prefix-summed in a trivially small window, and
    * broadcast back; the within-partition running sum is the one
    * genuinely imperative step — a mapPartitions pass over rows the
    * broadcast join delivers still in sorted order (BHJ preserves
    * streamed-side order). A Window.partitionBy(pid) instead would
    * re-shuffle the full data by pid even though rows are already
    * partition-local. Leaves `__offset` behind for the caller to drop. */
  private[operators] def runningStart(keyed: DataFrame): DataFrame = {
    val wOff = Window.orderBy(col("__pid"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = keyed.groupBy(col("__pid"))
      .agg(sum(col("__t")).as("__ptot"))
      .withColumn("__offset", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__pid"), col("__offset"))
    val joined = keyed.join(broadcast(offsets), "__pid")
    val outSchema = joined.schema
      .add("__start", org.apache.spark.sql.types.LongType, nullable = false)
    val tIdx = joined.schema.fieldIndex("__t")
    val offIdx = joined.schema.fieldIndex("__offset")
    joined.mapPartitions { rows =>
      var cum = -1L
      rows.map { r =>
        if (cum < 0) cum = r.getLong(offIdx)
        val start = cum
        cum += r.getLong(tIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** DuckDB SQL fragment computing the same shard id with a sequential
    * window (`exprs` must use the same idCol/tokenCol names). */
  def shardIdSql(idCol: String, tokenCol: String, maxTokens: Long): String =
    s"""CAST(floor((sum($tokenCol) OVER (ORDER BY md5(CAST($idCol AS VARCHAR))
       | ROWS UNBOUNDED PRECEDING) - $tokenCol) / $maxTokens) AS BIGINT)"""
      .stripMargin.replace("\n", "")

  /** Packing WITH intra-document splitting: the token stream is cut
    * every `maxTokens` exactly, so a document straddling a boundary
    * contributes its head to one shard and its tail to the next —
    * every shard is exactly full except the last (the semantics of
    * concat-then-chunk tokenizer packing). Emits one row per
    * (document, shard) overlap: `shard_id`, `tokens_in_shard`, and the
    * document's `start_offset`. Pure integer arithmetic on top of the
    * same two-phase prefix sum as [[packByTokenBudget]], then a
    * per-row sequence/explode over the (few) shards each document
    * touches — all exact, engine-portable. */
  def packWithSplitting(df: DataFrame, idCol: String, tokenCol: String,
                        maxTokens: Long, parts: Int = 32): DataFrame = {
    val packed = packByTokenBudget(df, idCol, tokenCol, maxTokens, parts,
      keepStart = true)
    packed
      .where(col(tokenCol) > 0)   // zero-token docs occupy no shard
      .withColumn("__end", col("__start") + col(tokenCol).cast("long"))
      .withColumn("shard_id", explode(sequence(
        floor(col("__start") / maxTokens),
        floor((col("__end") - 1) / maxTokens))))
      .withColumn("tokens_in_shard",
        least(col("__end"), (col("shard_id") + 1) * maxTokens) -
          greatest(col("__start"), col("shard_id") * maxTokens))
      .withColumn("start_offset", col("__start"))
      .drop("__start", "__end")
  }

  /** Write packed rows as a shard-partitioned parquet layout
    * (`outDir/shard_id=N/...`) — the on-disk form a training loader
    * consumes. The repartition on shard_id makes each shard directory
    * the output of (roughly) one task: no small-file spray, and a
    * reader pulling one shard touches one directory. */
  def writeShards(packed: DataFrame, outDir: String): Unit =
    packed.repartition(col("shard_id"))
      .write.partitionBy("shard_id").mode("overwrite").parquet(outDir)

  /** Per-shard packing summary: document count, token sum, fill ratio. */
  def shardSummary(packed: DataFrame, tokenCol: String,
                   maxTokens: Long): DataFrame =
    packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(tokenCol)).as("sum_tokens"))
      .withColumn("fill_ratio",
        round(col("sum_tokens").cast("double") / maxTokens, 4))
}
