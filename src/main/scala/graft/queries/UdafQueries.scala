package graft.queries

import graft.Tables
import graft.functions.Udafs
import org.apache.spark.sql.functions._

/** Custom-aggregate surface: a typed Aggregator UDAF participating in a
  * grouped aggregation exactly like a built-in (partial + final phases).
  */
object UdafQueries {

  /** Geometric mean of order totals per priority via the Aggregator —
    * oracle expresses the same math as exp(avg(ln x)). */
  val q36 = GQuery("q36_udaf_geomean",
    """SELECT o_orderpriority,
      |  count(*) AS n_orders,
      |  round(exp(avg(ln(o_totalprice))), 3) AS geomean_price
      |FROM orders
      |WHERE o_totalprice > 0
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .filter(col("o_totalprice") > 0)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"),
        round(Udafs.geomean(col("o_totalprice")), 3).as("geomean_price"))
      .orderBy(col("o_orderpriority"))
  }

  /** SQL GROUPING SETS (only reachable through the SQL surface —
    * DataFrame API exposes cube/rollup; this exercises spark.sql over
    * registered views). */
  val q37 = GQuery("q37_grouping_sets",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir).createOrReplaceTempView("lineitem")
    s.sql(
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS n_rows
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), ())
        |ORDER BY returnflag, linestatus""".stripMargin)
  }

  val all: Seq[GQuery] = Seq(q36, q37)
}
