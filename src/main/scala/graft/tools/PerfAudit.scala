package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.Registry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart,
  SparkListenerStageCompleted}

/** Deterministic per-query performance artifact: wall time on a shared
  * box swings ±15% run-to-run (measured r10), so round-over-round perf
  * judging uses the two signals that ARE deterministic — each query's
  * Spark JOB COUNT (the micro-batch/AQE ladder, [[DbgJobs]]) and its
  * ACTUAL shuffle read/write bytes ([[ShuffleAudit]]). This runs every
  * registry query once, serially and in sorted-name order (caching
  * effects are order-dependent but the order is pinned), and writes
  * one JSON file:
  *
  * {{{
  *   {"sf_dir": "...", "cores": 8,
  *    "queries": {"q01_...": {"jobs": 9, "shuffle_write_mb": 1.2,
  *                            "shuffle_read_mb": 1.2, "wall_s": 0.4}},
  *    "totals": {"jobs": N, "shuffle_write_mb": X, ...}}
  * }}}
  *
  * Walls are included but INFORMATIONAL — `scripts/perf_diff.py`
  * compares two artifacts and flags only jobs / shuffle-byte growth.
  *
  * Usage: runMain graft.tools.PerfAudit <out.json> [sfDir]
  * (SPARK_GRAFT_ONLY filters query names by prefix, as in Verify.)
  */
object PerfAudit {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("PERF.json")
    val sfDir = args.drop(1).headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"))
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSeq)
    val spark = GraftSession.local(8, "graft-perfaudit")
    spark.sparkContext.setLogLevel("ERROR")

    val jobs = new java.util.concurrent.atomic.AtomicLong(0L)
    @volatile var readB = 0L
    @volatile var writeB = 0L
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        jobs.incrementAndGet()
      override def onStageCompleted(s: SparkListenerStageCompleted): Unit = {
        readB += s.stageInfo.taskMetrics.shuffleReadMetrics.totalBytesRead
        writeB += s.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
      }
    })
    // listener events post asynchronously; queries run serially and the
    // noop write blocks until all stages finish, so settle until the
    // counters stop moving before taking each delta (ShuffleAudit move)
    def settle(): (Long, Long, Long) = {
      var prev = (-1L, -1L, -1L)
      var tries = 0
      while (prev != ((jobs.get(), readB, writeB)) && tries < 100) {
        prev = (jobs.get(), readB, writeB); Thread.sleep(30); tries += 1
      }
      prev
    }

    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    val qs = Registry.all.sortBy(_.name).filter(q =>
      only.forall(_.exists(q.name.startsWith)))
    settle()
    val rows = qs.map { q =>
      // WARM pass first, MEASURE the second (the DbgJobs discipline):
      // the warm pass populates every shared cache (token frames, pair
      // indexes) so the measured ladder is the steady-state one —
      // otherwise cache-population jobs land on whichever query sorts
      // first among a cache's consumers, and ADDING a query to the
      // registry shifts its neighbors' counts (measured: a false +4
      // on q100 when q338 joined the registry).
      def once(): Boolean =
        try {
          q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case e: Throwable =>
          System.err.println(s"[perfaudit] ${q.name} FAILED: ${e.getMessage}")
          false
        }
      once()
      settle()
      val (j0, r0, w0) = (jobs.get(), readB, writeB)
      val t0 = System.nanoTime()
      val ok = once()
      val wall = (System.nanoTime() - t0) / 1e9
      val (j1, r1, w1) = settle()
      (q.name, j1 - j0, r1 - r0, w1 - w0, wall, ok)
    }
    def mb(b: Long) = math.round(b / 1e4) / 100.0
    val items = rows.map { case (n, j, r, w, wall, ok) =>
      s""""$n":{"jobs":$j,"shuffle_read_mb":${mb(r)},""" +
        s""""shuffle_write_mb":${mb(w)},"wall_s":${math.round(wall * 100) / 100.0}""" +
        (if (ok) "}" else ""","failed":true}""")
    }.mkString(",")
    val totals =
      s"""{"queries":${rows.size},"jobs":${rows.map(_._2).sum},""" +
        s""""shuffle_read_mb":${mb(rows.map(_._3).sum)},""" +
        s""""shuffle_write_mb":${mb(rows.map(_._4).sum)},""" +
        s""""failed":${rows.count(!_._6)}}"""
    val json = s"""{"sf_dir":"$sfDir","cores":8,"totals":$totals,""" +
      s""""queries":{$items}}"""
    java.nio.file.Files.write(java.nio.file.Paths.get(out),
      json.getBytes("UTF-8"))
    println(s"[perfaudit] ${rows.size} queries, ${rows.map(_._2).sum} jobs, " +
      f"write=${mb(rows.map(_._4).sum)}%.1f MB → $out")
    spark.stop()
  }
}
