package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}

/** Job-count profiler for micro-batch-ladder queries: wall time on
  * the shared box is too noisy to validate job-fusion work, but the
  * JOB COUNT of a query is deterministic — run before/after a fusion
  * change to prove the ladder shrank.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.DbgJobs <query>"
  */
object DbgJobs {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q329_streaming_pit_enrich")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(32, "dbg-jobs")
    spark.sparkContext.setLogLevel("ERROR")
    val n = new java.util.concurrent.atomic.AtomicInteger(0)
    val callsites = sys.env.contains("SPARK_GRAFT_DBG_CALLSITES")
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        val k = n.incrementAndGet()
        if (callsites)
          System.err.println(s"[job#$k] stages=${j.stageInfos.size} " +
            j.stageInfos.map(_.name.takeWhile(_ != '\n')).mkString(" | "))
      }
    })
    // warm
    graft.queries.Registry.byName(name).run(spark, dir)
      .write.format("noop").mode("overwrite").save()
    Thread.sleep(500)
    n.set(0)
    val t0 = System.nanoTime()
    graft.queries.Registry.byName(name).run(spark, dir)
      .write.format("noop").mode("overwrite").save()
    val s = (System.nanoTime() - t0) / 1e9
    Thread.sleep(500)
    println(f"[jobs] $name: ${n.get()} jobs, ${s}%.2f s")
    spark.stop()
  }
}
