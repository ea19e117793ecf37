package graft.queries

import graft.Tables
import graft.operators.Profiling
import org.apache.spark.sql.functions._

/** Data-quality queries over [[graft.operators.Profiling]] — the
  * Deequ-shaped profile/constraint family. */
object ProfilingQueries {

  /** Generic per-column table profile of `lineitem` (see
    * [[graft.operators.Profiling.profile]]): row/null/distinct counts,
    * grid min/max for numerics, verbatim min/max for strings — ONE
    * scan for all columns. The oracle recomputes each column profile
    * independently and unions. */
  val q179 = GQuery("q179_table_profile",
    {
      val nums = Seq("l_orderkey", "l_quantity", "l_extendedprice",
        "l_discount")
      val strs = Seq("l_returnflag", "l_linestatus")
      val numSel = nums.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(round(min(CAST($c AS DOUBLE)) * 1e4) AS BIGINT) AS min4,
           |  CAST(round(max(CAST($c AS DOUBLE)) * 1e4) AS BIGINT) AS max4,
           |  CAST(NULL AS VARCHAR) AS min_s, CAST(NULL AS VARCHAR) AS max_s
           |FROM lineitem""".stripMargin
      }
      val strSel = strs.map { c =>
        s"""SELECT '$c' AS "column", count(*) AS n_rows,
           |  CAST(sum(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT)
           |    AS n_null,
           |  CAST(count(DISTINCT $c) AS BIGINT) AS n_distinct,
           |  CAST(NULL AS BIGINT) AS min4, CAST(NULL AS BIGINT) AS max4,
           |  min($c) AS min_s, max($c) AS max_s
           |FROM lineitem""".stripMargin
      }
      (numSel ++ strSel).mkString("", "\nUNION ALL\n", "\nORDER BY \"column\"")
    }) { (s, dir) =>
    Profiling.profile(Tables.lineitem(s, dir),
        numericCols = Seq("l_orderkey", "l_quantity", "l_extendedprice",
          "l_discount"),
        stringCols = Seq("l_returnflag", "l_linestatus"))
      .orderBy(col("column"))
  }

  /** Constraint audit across the TPC-H snapshot (see
    * [[graft.operators.Profiling]]): key uniqueness, referential
    * integrity (with a deliberately-broken variant proving the check
    * CAN fire — orders whose custkey is shifted out of range), and a
    * value-range rule — one (check, n_violations) row each, the
    * fitness report an ingest gates on. */
  val q180 = GQuery("q180_constraint_audit",
    """SELECT 'orders_pk_unique' AS check_name, CAST(coalesce(sum(n - 1), 0) AS BIGINT)
      |  AS n_violations FROM (
      |  SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1)
      |UNION ALL
      |SELECT 'orders_custkey_fk', CAST(count(*) AS BIGINT) FROM orders o
      |  ANTI JOIN customer c ON o.o_custkey = c.c_custkey
      |  WHERE o.o_custkey IS NOT NULL
      |UNION ALL
      |SELECT 'orders_custkey_shifted_fk', CAST(count(*) AS BIGINT) FROM (
      |  SELECT o_custkey * 1000 + 7 AS fk FROM orders) o
      |  ANTI JOIN customer c ON o.fk = c.c_custkey
      |UNION ALL
      |SELECT 'lineitem_orderkey_fk', CAST(count(*) AS BIGINT) FROM lineitem l
      |  ANTI JOIN orders o ON l.l_orderkey = o.o_orderkey
      |  WHERE l.l_orderkey IS NOT NULL
      |UNION ALL
      |SELECT 'discount_range', CAST(sum(CASE WHEN l_discount IS NOT NULL
      |    AND (l_discount < 0 OR l_discount > 0.1) THEN 1 ELSE 0 END)
      |  AS BIGINT) FROM lineitem
      |ORDER BY check_name""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val customer = Tables.customer(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    def tag(name: String, df: org.apache.spark.sql.DataFrame,
            vCol: String) =
      df.select(lit(name).as("check_name"), col(vCol).as("n_violations"))
    tag("orders_pk_unique",
        Profiling.uniqueViolations(orders, Seq("o_orderkey")),
        "n_surplus_rows")
      .unionAll(tag("orders_custkey_fk",
        Profiling.orphanCount(orders, "o_custkey", customer, "c_custkey"),
        "n_orphans"))
      .unionAll(tag("orders_custkey_shifted_fk",
        Profiling.orphanCount(
          orders.select((col("o_custkey") * 1000 + 7).as("fk")),
          "fk", customer, "c_custkey"),
        "n_orphans"))
      .unionAll(tag("lineitem_orderkey_fk",
        Profiling.orphanCount(lineitem, "l_orderkey", orders, "o_orderkey"),
        "n_orphans"))
      .unionAll(tag("discount_range",
        Profiling.rangeViolations(lineitem, "l_discount", 0.0, 0.1),
        "n_violations"))
      .orderBy(col("check_name"))
  }

  /** Z-order layout audit (see [[graft.operators.Layout]]): Morton
    * keys over (l_partkey, l_suppkey), bucketed by the top 6 z-bits —
    * per bucket, the exact span of BOTH dimensions (the min/max
    * file-skipping statistic a z-ordered export yields). The oracle
    * replays the identical unrolled interleave terms
    * ([[graft.operators.Layout.zorder2Sql]]). */
  val q182 = GQuery("q182_zorder_spans",
    s"""WITH z AS (
       |  SELECT ${graft.operators.Layout.zorder2Sql(
               "l_partkey", "l_suppkey")} AS zk,
       |    l_partkey % 65536 AS xv, l_suppkey % 65536 AS yv
       |  FROM lineitem)
       |SELECT zk >> 26 AS zb, count(*) AS n,
       |  min(xv) AS x_min, max(xv) AS x_max,
       |  min(yv) AS y_min, max(yv) AS y_max
       |FROM z GROUP BY zb ORDER BY zb""".stripMargin) { (s, dir) =>
    graft.operators.Layout.zorderSpans(Tables.lineitem(s, dir),
        "l_partkey", "l_suppkey", bits = 16, kBits = 3)
      .orderBy(col("zb"))
  }

  val all: Seq[GQuery] = Seq(q179, q180, q182)
}
