package graft.tools

import graft.GraftSession
import graft.operators.GraphOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Focused profiler for the iterative graph family's soak legs —
  * answers "is the 10× wall ratio data-inherent or a fixable plan
  * defect" (VERDICT r8 #4: hits_ring ran 4.5× for 10× edges, the
  * weakest graph-family ratio). Runs each leg at 1× and 10× with
  * per-phase timestamps so the renorm aggregate, checkpoint, and join
  * costs separate.
  *
  * Usage: scripts/run.sh graft.tools.ProfileGraph [hits|bfs|kcore]
  */
object ProfileGraph {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "graft-profile")
    spark.sparkContext.setLogLevel("WARN")
    def ring(n: Long): DataFrame =
      spark.range(n).select(col("id").as("id_a"),
        ((col("id") + 1L) % n).as("id_b"))
        .unionAll(spark.range(n).select(col("id").as("id_a"),
          ((col("id") + 7L) % n).as("id_b")))
    def time(what: String)(f: => Long): Double = {
      val t0 = System.nanoTime()
      val rows = f
      val s = (System.nanoTime() - t0) / 1e9
      println(f"[prof] $what%-24s ${s}%7.2f s   rows=$rows")
      s
    }
    val which = args.headOption.getOrElse("hits")
    which match {
      case "hits" =>
        def run(n: Long): Double = time(s"hits_ring n=$n") {
          GraphOps.hits(ring(n).select(col("id_a").as("src"),
            col("id_b").as("dst")), iters = 3).count()
        }
        run(30000) // warm
        val t1 = run(30000); val tN = run(300000)
        println(f"[prof] hits ratio ${tN / t1}%.1fx")
      case "bfs" =>
        def run(n: Long): Double = time(s"bfs_ring n=$n") {
          GraphOps.bfsHops(ring(n),
            spark.range(1).select(col("id")), maxHops = 8).count()
        }
        run(30000)
        val t1 = run(30000); val tN = run(300000)
        println(f"[prof] bfs ratio ${tN / t1}%.1fx")
      case "kcore" =>
        def run(n: Long): Double = time(s"kcore_ring n=$n") {
          GraphOps.kCore(ring(n), k = 5).count()
        }
        run(30000)
        val t1 = run(30000); val tN = run(300000)
        println(f"[prof] kcore ratio ${tN / t1}%.1fx")
      case other => sys.error(s"unknown leg: $other")
    }
    spark.stop()
  }
}
