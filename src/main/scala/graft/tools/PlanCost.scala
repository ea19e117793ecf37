package graft.tools

import graft.GraftSession

/** Split a query's warm wall into plan-construction / analysis+
  * optimization+physical-planning / execution (guide §7.3: driver-side
  * Catalyst time is invisible in job metrics — measure it directly).
  *
  * Usage: SPARK_GRAFT_SF_DIR=... sbt "runMain graft.tools.PlanCost <q1,q2,...> [reps]"
  */
object PlanCost {
  def main(args: Array[String]): Unit = {
    val names = args.headOption.getOrElse("q127_curation_v7").split(",").toSeq
    val reps = if (args.length > 1) args(1).toInt else 3
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.local(
      sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt, "plan-cost")
    spark.sparkContext.setLogLevel("ERROR")
    for (r <- 1 to reps; name <- names) {
      val q = graft.queries.Registry.byName(name)
      val t0 = System.nanoTime()
      val df = q.run(spark, dir)
      val t1 = System.nanoTime()
      val plan = df.queryExecution.executedPlan // analyze+optimize+plan
      val nNodes = plan.collect { case p => p }.size
      val t2 = System.nanoTime()
      df.write.format("noop").mode("overwrite").save()
      val t3 = System.nanoTime()
      println(f"[plancost] $name rep $r: build=${(t1 - t0) / 1e9}%.2f " +
        f"plan=${(t2 - t1) / 1e9}%.2f exec=${(t3 - t2) / 1e9}%.2f " +
        f"physNodes=$nNodes")
    }
    spark.stop()
  }
}
