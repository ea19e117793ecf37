package graft.tools

import graft.{GraftSession, Tables}
import graft.queries.Registry

/** Plan-hygiene audit: prints the formatted physical plan of each
  * headline query (or names passed as args) so pushdown, broadcast
  * choice, and codegen coverage can be inspected per SURVEY.md §4.2.
  *
  * Usage: runMain graft.tools.ExplainAudit [queryName ...]
  */
object ExplainAudit {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.local(8, "graft-explain")
    Tables.names.foreach(n => Tables.load(spark, sfDir, n).schema)
    val targets =
      if (args.nonEmpty) args.toSeq.map(Registry.byName)
      else Registry.headline
    targets.foreach { q =>
      println(s"\n========== ${q.name} ==========")
      println(q.run(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
