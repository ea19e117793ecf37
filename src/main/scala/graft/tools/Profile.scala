package graft.tools

import graft.GraftSession
import graft.queries.Registry

/** Repeated-run profiler: runMain graft.tools.Profile <query> [reps] —
  * separates plan/codegen warmup cost from steady-state execution. */
object Profile {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val reps = if (args.length > 1) args(1).toInt else 3
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profile")
    val q = Registry.byName(name)
    for (i <- 1 to reps) {
      val t0 = System.nanoTime()
      q.run(spark, sfDir).write.format("noop").mode("overwrite").save()
      println(f"[profile] $name rep $i: ${(System.nanoTime() - t0) / 1e9}%.2f s")
    }
    spark.stop()
  }
}
