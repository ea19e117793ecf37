package graft.queries

import graft.Tables
import org.apache.spark.sql.functions._

/** Set operations and the scalar-function surface (string / date / math /
  * JSON) — SURVEY.md §2.2. JSON extraction mirrors the reference's only
  * compute (JSON.parse, src/Consumer.coffee:91) relationally.
  */
object SetOpsScalar {

  /** UNION / INTERSECT / EXCEPT over nation keys of customers vs
    * suppliers, tagged into one result. */
  val q18 = GQuery("q18_set_ops",
    """SELECT tag, nkey FROM (
      |  SELECT 'both' AS tag, nkey FROM (
      |    SELECT DISTINCT c_nationkey AS nkey FROM customer
      |    INTERSECT SELECT DISTINCT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'cust_only' AS tag, nkey FROM (
      |    SELECT DISTINCT c_nationkey AS nkey FROM customer
      |    EXCEPT SELECT DISTINCT s_nationkey FROM supplier)
      |  UNION ALL
      |  SELECT 'either' AS tag, nkey FROM (
      |    SELECT DISTINCT c_nationkey AS nkey FROM customer
      |    UNION SELECT DISTINCT s_nationkey FROM supplier))
      |ORDER BY tag, nkey""".stripMargin) { (s, dir) =>
    val cust = Tables.customer(s, dir).select(col("c_nationkey").as("nkey")).distinct()
    val supp = Tables.supplier(s, dir).select(col("s_nationkey").as("nkey")).distinct()
    cust.intersect(supp).select(lit("both").as("tag"), col("nkey"))
      .unionByName(cust.except(supp).select(lit("cust_only").as("tag"), col("nkey")))
      .unionByName(cust.union(supp).distinct().select(lit("either").as("tag"), col("nkey")))
      .orderBy(col("tag"), col("nkey"))
  }

  /** String + date + math scalar functions over orders, grouped monthly. */
  val q19 = GQuery("q19_scalar_functions",
    """SELECT strftime(o_orderdate, '%Y-%m') AS month_str,
      |  upper(substr(o_orderpriority, 3, 30)) AS priority_name,
      |  count(*) AS n_orders,
      |  round(avg(sqrt(o_totalprice)), 3) AS avg_sqrt_price,
      |  round(avg(ln(o_totalprice + 1)), 3) AS avg_log_price
      |FROM orders
      |GROUP BY month_str, priority_name
      |ORDER BY month_str, priority_name""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(
        date_format(col("o_orderdate"), "yyyy-MM").as("month_str"),
        upper(substring(col("o_orderpriority"), 3, 30)).as("priority_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        round(avg(sqrt(col("o_totalprice"))), 3).as("avg_sqrt_price"),
        round(avg(log(col("o_totalprice") + 1)), 3).as("avg_log_price"))
      .orderBy(col("month_str"), col("priority_name"))
  }

  /** JSON payload extraction (the engine analog of the reference's
    * JSON.parse consumer path): pull `k` out of the props JSON column,
    * aggregate by k mod 10. */
  val q20 = GQuery("q20_json_extract",
    """SELECT CAST(CAST(json_extract_string(props, '$.k') AS INT) % 10 AS INT) AS kmod,
      |  count(*) AS n,
      |  round(avg(value), 3) AS avg_value
      |FROM events
      |GROUP BY kmod
      |ORDER BY kmod""".stripMargin) { (s, dir) =>
    Tables.events(s, dir)
      .groupBy((get_json_object(col("props"), "$.k").cast("int") % 10).cast("int").as("kmod"))
      .agg(count(lit(1)).as("n"), round(avg(col("value")), 3).as("avg_value"))
      .orderBy(col("kmod"))
  }

  /** Higher-order array / map functions: per-order array of quantities →
    * transform / filter / aggregate without exploding. */
  val q22 = GQuery("q22_higher_order_fns",
    """WITH arrs AS (
      |  SELECT l_orderkey, list(l_quantity ORDER BY l_linenumber) AS qtys
      |  FROM lineitem GROUP BY l_orderkey)
      |SELECT l_orderkey,
      |  CAST(len(qtys) AS INT) AS n_lines,
      |  round(list_sum(list_transform(qtys, q -> q * 2.0)), 2) AS doubled_sum,
      |  CAST(len(list_filter(qtys, q -> q > 25)) AS INT) AS n_big
      |FROM arrs
      |ORDER BY l_orderkey
      |LIMIT 1000""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(array_sort(collect_list(struct(col("l_linenumber"), col("l_quantity")))).as("pairs"))
      // One fused traversal instead of transform + aggregate + filter:
      // l_quantity is integer-valued (1..50), so doubled sums are exact
      // doubles and traversal order cannot change any output bit.
      .select(col("l_orderkey"),
        size(col("pairs")).as("n_lines"),
        expr("""aggregate(pairs, named_struct('s', 0.0D, 'c', 0),
                (acc, p) -> named_struct('s', acc.s + p.l_quantity * 2.0D,
                                         'c', acc.c + IF(p.l_quantity > 25, 1, 0)))""").as("sc"))
      .select(col("l_orderkey"), col("n_lines"),
        round(col("sc.s"), 2).as("doubled_sum"), col("sc.c").as("n_big"))
      .orderBy(col("l_orderkey"))
      .limit(1000)
  }

  val all: Seq[GQuery] = Seq(q18, q19, q20, q22)
}
