package graft.tools

import graft.GraftSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd,
  SparkListenerJobStart}

/** Per-JOB wall attribution for one query (guide §1: find where the
  * time goes before touching anything): warm first, then run once and
  * print every job's duration + its stages' callsites, sorted by cost.
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.JobTimes <query>"
  */
object JobTimes {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("q343_louvain_communities")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "job-times")
    spark.sparkContext.setLogLevel("ERROR")
    val starts = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val rows = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Long, String)]()
    @volatile var record = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (record) {
          val names = j.stageInfos.map(si =>
            si.name.takeWhile(_ != '\n')).mkString(" | ")
          starts.put(j.jobId, (System.nanoTime(), names))
        }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        if (record) {
          val s = starts.remove(j.jobId)
          if (s != null)
            rows.add((j.jobId, System.nanoTime() - s._1, s._2))
        }
    })
    def once(): Double = {
      val t0 = System.nanoTime()
      graft.queries.Registry.byName(name).run(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    once(); once() // warm (twice: codegen + caches)
    Thread.sleep(300)
    record = true
    val wall = once()
    Thread.sleep(300)
    record = false
    val all = {
      val b = Vector.newBuilder[(Int, Long, String)]
      rows.forEach(r => b += r)
      b.result()
    }
    println(f"[jobtimes] $name wall=$wall%.2f s, jobs=${all.size}, " +
      f"job-sum=${all.map(_._2).sum / 1e9}%.2f s")
    all.sortBy(-_._2).take(40).foreach { case (id, ns, names) =>
      println(f"[jobtimes] ${ns / 1e6}%8.1f ms  job#$id  $names")
    }
    spark.stop()
  }
}
