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
    * @param parts    partitions for the bucketed prefix sum (8
    *                 contiguous hash-range buckets each) — on a real
    *                 cluster ~2-3× total cores
    */
  def packByTokenBudget(df: DataFrame, idCol: String, tokenCol: String,
                        maxTokens: Long, parts: Int = 32,
                        keepStart: Boolean = false): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    // The sort key is md5 — uniform BY CONSTRUCTION — so the range
    // partition is derived arithmetically from the first 16 bits of the
    // hash instead of `repartitionByRange`: a RangePartitioner SAMPLES
    // its child, which re-executes the entire upstream pipeline once
    // per materialization (and composes multiplicatively when packing
    // sits above another range sort, as in the q77 capstone). Buckets
    // are contiguous hash ranges, 8 per partition so the hash
    // placement of buckets onto partitions balances; the prefix sum is
    // keyed per-bucket, so bucket→partition placement doesn't matter
    // for order.
    val nBkt = 8 * parts
    val keyed = df
      .withColumn("__t", col(tokenCol).cast("long"))
      .withColumn("__h", md5(col(idCol).cast("string")))
      .withColumn("__bkt", floor(
        conv(substring(col("__h"), 1, 4), 16, 10).cast("long") * nBkt / 65536)
        .cast("int"))
      .repartition(parts, col("__bkt"))
    val out = runningStartByBucket(keyed, col("__h"))
      .withColumn("shard_id", floor(col("__start") / maxTokens))
      .drop("__t", "__h", "__bkt", "__offset")
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

  /** The sampling-free variant of [[runningStart]] for hash-ordered
    * data: `keyed` carries `__bkt` (an ORDERED contiguous-range bucket
    * id derived from the sort key `sortKey`) and is hash-partitioned on
    * `__bkt`. Offsets are prefix-summed per BUCKET (tiny window over
    * ≤ nBkt rows) and broadcast back; the partition-local pass resets
    * its running sum at every bucket boundary, so bucket→partition
    * placement is free to be a plain hash — no RangePartitioner, no
    * sampling scan.
    *
    * The (`__bkt`, sortKey) local sort is applied AFTER the broadcast
    * join, immediately below the mapPartitions: a local sort below a
    * join child gets removed by Catalyst's EliminateSorts (row order is
    * not part of join semantics — the pid-keyed [[runningStart]] only
    * keeps its sort because the nondeterministic spark_partition_id
    * projection blocks that rule), while no rule touches a sort feeding
    * a MapPartitions. BHJ is shuffle-free, so sorting after it is
    * equivalent. */
  private[operators] def runningStartByBucket(keyed: DataFrame,
                                              sortKey: Column): DataFrame = {
    val wOff = Window.orderBy(col("__bkt"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow - 1)
    val offsets = keyed.groupBy(col("__bkt"))
      .agg(sum(col("__t")).as("__ptot"))
      .withColumn("__offset", coalesce(sum(col("__ptot")).over(wOff), lit(0L)))
      .select(col("__bkt"), col("__offset"))
    val joined = keyed.join(broadcast(offsets), "__bkt")
      .sortWithinPartitions(col("__bkt"), sortKey)
    val outSchema = joined.schema
      .add("__start", org.apache.spark.sql.types.LongType, nullable = false)
    val tIdx = joined.schema.fieldIndex("__t")
    val offIdx = joined.schema.fieldIndex("__offset")
    val bIdx = joined.schema.fieldIndex("__bkt")
    joined.mapPartitions { rows =>
      var cur = Int.MinValue
      var cum = 0L
      rows.map { r =>
        val b = r.getInt(bIdx)
        if (b != cur) { cum = r.getLong(offIdx); cur = b }
        val start = cum
        cum += r.getLong(tIdx)
        org.apache.spark.sql.Row.fromSeq(r.toSeq :+ start)
      }
    }(org.apache.spark.sql.Encoders.row(outSchema))
  }

  /** [[packByTokenBudget]] in an EXPLICIT global order
    * (orderCol DESC, idCol) — curriculum packing: order the corpus by a
    * difficulty/quality signal and cut shards along that order, so a
    * training loader reading shards in sequence sees the curriculum.
    * Shard boundaries respect the order exactly: every doc in shard i
    * has orderCol ≥ every doc in shard i+1 (up to ties).
    *
    * A non-uniform order key cannot use the arithmetic hash buckets,
    * so this is the RangePartitioner + pid-keyed prefix-sum path
    * ([[runningStart]]) — one sampling pass of the input per
    * materialization; feed it a MATERIALIZED narrow frame (id, tokens,
    * order), as the q77 capstone does for its scored frame. */
  def packByOrder(df: DataFrame, idCol: String, tokenCol: String,
                  orderCol: String, maxTokens: Long, parts: Int = 32,
                  keepStart: Boolean = false): DataFrame = {
    require(maxTokens > 0, "maxTokens must be positive")
    val keyed = df
      .withColumn("__t", col(tokenCol).cast("long"))
      .repartitionByRange(parts, col(orderCol).desc, col(idCol))
      .sortWithinPartitions(col(orderCol).desc, col(idCol))
      .withColumn("__pid", spark_partition_id())
    val out = runningStart(keyed)
      .withColumn("shard_id", floor(col("__start") / maxTokens))
      .drop("__t", "__pid", "__offset")
    if (keepStart) out else out.drop("__start")
  }

  /** Padding-waste census: what a fixed-`batchRows` training loader
    * pads, under arrival-order batching vs length-bucketed batching
    * (sort by length DESC, cut every `batchRows` docs — the standard
    * bucketing trick). Each batch pads every row to the batch max, so
    * padded = Σ_b count_b·max_b; the report emits one row per strategy
    * with the exact waste share on the 1e-4 grid — the readout that
    * justifies (or kills) adding a bucketing stage to a loader.
    *
    * Scale: batch assignment is [[packByOrder]] with unit weights —
    * the two-phase range-partitioned prefix sum, never a
    * single-partition window; per-batch aggregates are keyed. Returns
    * (strategy, n_docs, n_batches, total_tokens, padded_tokens,
    * waste_share4) for strategies 'arrival' and 'length_bucketed'. */
  def paddingWasteReport(df: DataFrame, idCol: String, tokenCol: String,
                         batchRows: Long, parts: Int = 32): DataFrame = {
    require(batchRows > 0, "batchRows must be positive")
    def report(name: String, ord: Column): DataFrame =
      packByOrder(
          df.select(col(idCol), col(tokenCol).cast("long").as("__len"))
            .withColumn("__one", lit(1L))
            .withColumn("__ord", ord),
          idCol, "__one", "__ord", batchRows, parts)
        .groupBy(col("shard_id"))
        .agg(count(lit(1)).as("nb"), max(col("__len")).as("mx"),
          sum(col("__len")).as("st"))
        .agg(sum(col("nb")).as("n_docs"),
          count(lit(1)).as("n_batches"),
          sum(col("st")).as("total_tokens"),
          sum(col("nb") * col("mx")).as("padded_tokens"))
        .select(lit(name).as("strategy"), col("n_docs"), col("n_batches"),
          col("total_tokens"), col("padded_tokens"),
          expr("(2 * 10000 * (padded_tokens - total_tokens) " +
            "+ padded_tokens) div (2 * padded_tokens)").as("waste_share4"))
    // packByOrder sorts (__ord DESC, id ASC): a constant key yields
    // pure arrival (id) order; the length key yields longest-first —
    // exactly how bucketing loaders sort
    report("arrival", lit(0L))
      .unionAll(report("length_bucketed", col("__len")))
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

  /** Shard manifest with integrity hashes — the artifact a reproducible
    * training run records next to each exported shard: membership hash
    * (md5 over the ordered doc-id list) and content hash (md5 over the
    * ordered per-doc content fingerprints in `fpCol`), so a re-export
    * can be byte-verified against the manifest without re-reading any
    * shard and a membership or content drift names the exact shard.
    *
    * Scale: one shard-keyed aggregate; the collect_lists are bounded by
    * docs-per-shard (the token budget bounds membership), never
    * corpus-sized. */
  def shardManifest(packed: DataFrame, idCol: String, tokenCol: String,
                    fpCol: String): DataFrame =
    packed.groupBy(col("shard_id"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col(tokenCol)).as("sum_tokens"),
        md5(array_join(transform(sort_array(collect_list(col(idCol))),
          _.cast("string")), "-")).as("ids_hash"),
        md5(array_join(
          sort_array(collect_list(struct(col(idCol), col(fpCol))))
            .getField(fpCol), "")).as("content_hash"))
}
