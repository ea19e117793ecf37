package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.Registry
import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Shuffle-budget audit: runs every registry query serially and
  * reports the ACTUAL shuffle read/write bytes each moved (stage
  * metrics via a SparkListener, delta'd around each query). The
  * empirical companion to PlanLint's structural checks: a plan can
  * look right and still shuffle the corpus — this catches it by
  * measurement. Queries are ranked by shuffle write; the tool fails
  * if any single query shuffles more than `maxShuffleGb` (default 8 —
  * far above anything legitimate at the test SFs).
  *
  * Usage: runMain graft.tools.ShuffleAudit [sfDir]
  */
object ShuffleAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val maxShuffleGb = sys.env.getOrElse("SPARK_GRAFT_MAX_SHUFFLE_GB", "8").toDouble
    val spark = GraftSession.local(8, "graft-shuffleaudit")
    spark.sparkContext.setLogLevel("WARN")

    @volatile var readB = 0L
    @volatile var writeB = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        readB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        writeB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })

    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    val rows = Registry.all.sortBy(_.name).map { q =>
      val (r0, w0) = (readB, writeB)
      try q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[shuffleaudit] ${q.name} failed: ${e.getMessage}")
      }
      // listener events are posted asynchronously (the bus API is
      // private[spark]); queries run serially and the noop write
      // blocks until all stages finish, so settle until the counters
      // stop moving before taking the delta
      var prev = (-1L, -1L)
      var tries = 0
      while (prev != ((readB, writeB)) && tries < 100) {
        prev = (readB, writeB); Thread.sleep(30); tries += 1
      }
      (q.name, readB - r0, writeB - w0)
    }
    def mb(b: Long) = b / 1e6
    println("[shuffleaudit] top 15 by shuffle write:")
    rows.sortBy(-_._3).take(15).foreach { case (n, r, w) =>
      println(f"[shuffleaudit] $n%-30s write=${mb(w)}%9.1f MB read=${mb(r)}%9.1f MB")
    }
    val totW = rows.map(_._3).sum
    val totR = rows.map(_._2).sum
    println(f"[shuffleaudit] TOTAL write=${mb(totW)}%.1f MB read=${mb(totR)}%.1f MB over ${rows.size} queries")
    // full roster so `RegistryReport --check` can hold this artifact
    // to registry lockstep (the r11 q342 drift class)
    println(s"[shuffleaudit] audited (${rows.size}): " +
      rows.map(_._1).sorted.mkString(", "))
    val bad = rows.filter(_._3 > maxShuffleGb * 1e9)
    if (bad.nonEmpty) {
      System.err.println(s"[shuffleaudit] FAIL over-budget: " +
        bad.map(b => f"${b._1} ${mb(b._3)}%.0f MB").mkString(", "))
      spark.stop(); sys.exit(1)
    }
    println("[shuffleaudit] OK: every query within the shuffle budget")
    spark.stop()
  }
}
