package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.Registry

/** Plan lint: builds every registry query's physical plan and flags
  * scale hazards — a non-broadcast CartesianProduct is an automatic
  * failure (at 100 TB that plan never finishes). Prints a one-line
  * shuffle/join census per query for eyeballing.
  *
  * Usage: runMain graft.tools.PlanLint
  */
object PlanLint {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    val spark = GraftSession.local(8, "graft-planlint")
    // inspect static plans — with AQE on, the physical plan is hidden
    // inside an AdaptiveSparkPlanExec wrapper until execution
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    var bad = List.empty[String]
    Registry.all.sortBy(_.name).foreach { q =>
      val plan = q.run(spark, sfDir).queryExecution.executedPlan
      var cartesian = 0; var shuffles = 0; var bhj = 0; var smj = 0; var bnlj = 0
      plan.foreachUp {
        case _: org.apache.spark.sql.execution.joins.CartesianProductExec => cartesian += 1
        case _: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => shuffles += 1
        case _: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => bhj += 1
        case _: org.apache.spark.sql.execution.joins.SortMergeJoinExec => smj += 1
        case _: org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec => bnlj += 1
        case _ =>
      }
      println(f"[planlint] ${q.name}%-28s shuffles=$shuffles bhj=$bhj smj=$smj bnlj=$bnlj cartesian=$cartesian")
      if (cartesian > 0) bad ::= q.name
    }
    if (bad.nonEmpty) {
      System.err.println(s"[planlint] FAIL: CartesianProduct in: ${bad.mkString(", ")}")
      spark.stop(); sys.exit(1)
    }
    println("[planlint] OK: no non-broadcast cartesian products")
    spark.stop()
  }
}
