package graft.tools

import graft.GraftSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Wall-time breakdown for streaming queries: registers a
  * StreamingQueryListener and dumps each micro-batch's `durationMs`
  * map (addBatch / getBatch / queryPlanning / walCommit / commitOffsets
  * / triggerExecution) plus state-operator commit times, so streaming
  * wall cost attributes to planning vs state-store vs offset-log work
  * instead of guessing (guide §1: measure first).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.StreamProfile <query>"
  */
object StreamProfile {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q331_stream_stream_interval_join")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "stream-profile")
    spark.sparkContext.setLogLevel("ERROR")
    spark.streams.addListener(new StreamingQueryListener {
      override def onQueryStarted(
          e: StreamingQueryListener.QueryStartedEvent): Unit =
        println(s"[stream] started ${e.name}")
      override def onQueryProgress(
          e: StreamingQueryListener.QueryProgressEvent): Unit = {
        val p = e.progress
        val dur = p.durationMs
        println(s"[stream] batch=${p.batchId} rows=${p.numInputRows} " +
          s"durations=$dur")
        p.stateOperators.foreach { so =>
          println(s"[stream]   state op=${so.operatorName} " +
            s"rowsTotal=${so.numRowsTotal} updated=${so.numRowsUpdated} " +
            s"commitMs=${so.commitTimeMs} memUsed=${so.memoryUsedBytes}")
        }
      }
      override def onQueryTerminated(
          e: StreamingQueryListener.QueryTerminatedEvent): Unit =
        println(s"[stream] terminated")
    })
    val reps = sys.env.getOrElse("SPARK_GRAFT_REPS", "2").toInt
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      graft.queries.Registry.byName(name).run(spark, dir)
        .write.format("noop").mode("overwrite").save()
      println(f"[stream] $name rep $i total ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
