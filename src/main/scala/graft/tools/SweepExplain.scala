package graft.tools

import graft.GraftSession
import org.apache.spark.sql.functions._

/** Scratch: print one Louvain refine-sweep plan to check whether the
  * edge-sized kvc aggregate is shared via ReusedExchange or computed
  * twice (it feeds both the kva lookup and the candidate join). */
object SweepExplain {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(8, "sweep-explain")
    import spark.implicits._
    val e = Seq((1L, 2L), (2L, 1L), (2L, 3L), (3L, 2L), (3L, 1L), (1L, 3L))
      .toDF("src", "dst")
    val l = Seq((1L, 1L), (2L, 2L), (3L, 3L)).toDF("id", "community")
    val out = graft.operators.GraphOps.modularityRefineRound(l, e)
    val s = out.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    println(s)
    println("== ReusedExchange count: " +
      "ReusedExchange".r.findAllIn(s).length)
    println("== Exchange count: " + "Exchange".r.findAllIn(s).length)
    println("== HashAggregate count: " + "HashAggregate".r.findAllIn(s).length)
    spark.stop()
  }
}
