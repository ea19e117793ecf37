package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}

/** Streaming sink helpers (SURVEY.md §2.2 "Sinks" row): foreachBatch for
  * arbitrary batch-side logic (oracle comparisons, upserts, multi-sink
  * fan-out), plus the drain trigger used to run a stream to completion
  * as a batch job.
  */
object StreamSinks {

  /** foreachBatch sink: hand each micro-batch (a regular DataFrame) +
    * its batch id to `f`. The bridge between streaming and every batch
    * capability the engine has (joins, parquet writes, oracle diffing). */
  def foreachBatchSink(df: DataFrame)(f: (DataFrame, Long) => Unit): DataStreamWriter[Row] =
    df.writeStream.foreachBatch(f)

  /** Process everything currently available, then stop — the streaming
    * equivalent of a bounded batch run (used for backfills/replays). */
  def availableNow(w: DataStreamWriter[Row]): DataStreamWriter[Row] =
    w.trigger(Trigger.AvailableNow())
}
