package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Repeated-run profiler: runMain graft.tools.Profile <q1[,q2,…]> [reps]
  * — separates plan/codegen warmup cost from steady-state execution;
  * a comma-separated list runs the queries in order within ONE session
  * (shows cross-query cache reuse, like the bench harness). */
object Profile {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profile")
    for (i <- 1 to reps; name <- names) {
      val q = Registry.byName(name)
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
