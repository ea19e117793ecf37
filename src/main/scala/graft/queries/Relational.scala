package graft.queries

import graft.Tables
import graft.operators.AsOfJoin
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Core relational surface: scan/filter/project, joins of every flavor,
  * aggregation incl. distinct / rollup / cube (SURVEY.md §2.2).
  *
  * Scale notes baked into each plan:
  *  - dimension joins broadcast explicitly (region/nation/supplier/tiers);
  *  - fact-fact joins shuffle on their keys and rely on AQE for skew;
  *  - every aggregate is a hash aggregate with map-side partials (free
  *    from Catalyst once expressed as groupBy.agg);
  *  - filters/projections sit directly on the parquet scan so pushdown
  *    and column pruning engage.
  */
object Relational {

  /** TPC-H Q1-style pricing summary: full-scan hash aggregate. */
  val q01 = GQuery("q01_pricing_summary",
    """SELECT l_returnflag, l_linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  round(sum(l_extendedprice), 2) AS sum_base_price,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
      |  round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
      |  round(avg(l_quantity), 4) AS avg_qty,
      |  round(avg(l_extendedprice), 4) AS avg_price,
      |  round(avg(l_discount), 4) AS avg_disc,
      |  count(*) AS count_order
      |FROM lineitem
      |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        round(sum(col("l_quantity")), 2).as("sum_qty"),
        round(sum(col("l_extendedprice")), 2).as("sum_base_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))), 2).as("sum_charge"),
        round(avg(col("l_quantity")), 4).as("avg_qty"),
        round(avg(col("l_extendedprice")), 4).as("avg_price"),
        round(avg(col("l_discount")), 4).as("avg_disc"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }.copy(headline = true)

  /** Filter + project + top-N: predicate and both referenced columns push
    * into the parquet scan; ORDER BY ... LIMIT becomes TakeOrdered (no
    * full sort materialization). */
  // revenue rounding is floor(x*100 + 0.5)/100 on BOTH engines: engine
  // round() differs on half-ULP boundaries (Spark HALF_UP said 8285.43
  // where DuckDB's round of the same double said 8285.42 at sf0.001);
  // pure double arithmetic is bit-identical everywhere.
  val q02 = GQuery("q02_filter_project",
    """SELECT l_orderkey, l_linenumber,
      |  floor(l_extendedprice * (1 - l_discount) * 100 + 0.5) / 100 AS revenue
      |FROM lineitem
      |WHERE l_quantity > 45
      |  AND l_shipdate >= TIMESTAMP '1996-01-01'
      |  AND l_shipdate < TIMESTAMP '1997-01-01'
      |ORDER BY revenue DESC, l_orderkey, l_linenumber
      |LIMIT 100""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .filter(col("l_quantity") > 45 &&
        col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("l_orderkey"), col("l_linenumber"),
        (floor(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100 + 0.5) / 100)
          .as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey"), col("l_linenumber"))
      .limit(100)
  }

  /** Star join through broadcast dims: lineitem ⋈ supplier ⋈ nation ⋈
    * region, revenue per nation. All three dims broadcast — zero shuffle
    * on the fact side until the final aggregate. */
  val q03 = GQuery("q03_broadcast_join",
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM lineitem
      |JOIN supplier ON l_suppkey = s_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .join(broadcast(Tables.supplier(s, dir)), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, dir)), col("s_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }.copy(headline = true)

  /** Fact-fact semi join (TPC-H Q4 flavor): orders that have ≥1 line item
    * shipped >90 days after the order date, counted per priority.
    * The semi join shuffles both facts on orderkey — the scalable shape,
    * since neither side is broadcastable at 100 TB. */
  val q04 = GQuery("q04_semijoin_facts",
    """SELECT o_orderpriority, count(*) AS n_orders
      |FROM orders
      |WHERE EXISTS (
      |  SELECT 1 FROM lineitem
      |  WHERE l_orderkey = o_orderkey
      |    AND l_shipdate > o_orderdate + INTERVAL 90 DAY)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val lineitem = Tables.lineitem(s, dir)
    orders.join(lineitem,
        col("l_orderkey") === col("o_orderkey") &&
          col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }.copy(headline = true)

  /** Left-semi join: customers that placed at least one high-value order,
    * per market segment. */
  val q05 = GQuery("q05_semi_join",
    """SELECT c_mktsegment, count(*) AS n_customers
      |FROM customer
      |WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 100000)
      |GROUP BY c_mktsegment
      |ORDER BY c_mktsegment""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 100000),
        col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("c_mktsegment"))
  }

  /** Left-anti join: customers with no high-value order, per nation
    * (nation broadcast). */
  val q06 = GQuery("q06_anti_join",
    """SELECT n_name, count(*) AS n_customers
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 400000)
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir)
      .join(Tables.orders(s, dir).filter(col("o_totalprice") > 400000),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .join(broadcast(Tables.nation(s, dir)), col("c_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("n_name"))
  }

  /** Theta self-join: distinct nation pairs within a region (equi part
    * hash-joins on regionkey; `<` is the theta residual). */
  val q07 = GQuery("q07_theta_self_join",
    """SELECT n1.n_name AS nation_a, n2.n_name AS nation_b, n1.n_regionkey AS regionkey
      |FROM nation n1 JOIN nation n2
      |  ON n1.n_regionkey = n2.n_regionkey AND n1.n_nationkey < n2.n_nationkey
      |ORDER BY nation_a, nation_b""".stripMargin) { (s, dir) =>
    val n1 = Tables.nation(s, dir).select(
      col("n_nationkey").as("k1"), col("n_name").as("nation_a"), col("n_regionkey").as("regionkey"))
    val n2 = Tables.nation(s, dir).select(
      col("n_nationkey").as("k2"), col("n_name").as("nation_b"), col("n_regionkey").as("r2"))
    n1.join(n2, col("regionkey") === col("r2") && col("k1") < col("k2"))
      .select(col("nation_a"), col("nation_b"), col("regionkey"))
      .orderBy(col("nation_a"), col("nation_b"))
  }

  /** Range (interval) join: parts bucketed into price tiers via a
    * broadcast nested-loop join against a tiny tier table — the classic
    * "bin the range, broadcast the bins" shape. */
  val q08 = GQuery("q08_range_join",
    """SELECT t.tier AS tier, count(*) AS n_parts, round(avg(p_retailprice), 3) AS avg_price
      |FROM part
      |JOIN (VALUES (0, 900.0, 920.0), (1, 920.0, 940.0), (2, 940.0, 960.0),
      |             (3, 960.0, 980.0), (4, 980.0, 1000.0)) t(tier, lo, hi)
      |  ON p_retailprice >= t.lo AND p_retailprice < t.hi
      |GROUP BY t.tier
      |ORDER BY tier""".stripMargin) { (s, dir) =>
    import s.implicits._
    val tiers = Seq((0, 900.0, 920.0), (1, 920.0, 940.0), (2, 940.0, 960.0),
      (3, 960.0, 980.0), (4, 980.0, 1000.0)).toDF("tier", "lo", "hi")
    Tables.part(s, dir)
      .join(broadcast(tiers), col("p_retailprice") >= col("lo") && col("p_retailprice") < col("hi"))
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n_parts"), round(avg(col("p_retailprice")), 3).as("avg_price"))
      .orderBy(col("tier"))
  }

  /** As-of join: for every purchase event, the most recent prior (or
    * simultaneous) view by the same user. Right side pre-aggregated to
    * one row per (user, ts) so the as-of match is well-defined. See
    * [[graft.operators.AsOfJoin]] for the union+window plan. */
  val q09 = GQuery("q09_asof_join",
    """WITH v AS (
      |  SELECT user_id, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, ts, round(value, 3) AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id AS purchase_id, p.user_id AS user_id,
      |  p.purchase_value AS purchase_value, v.view_id AS view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val events = Tables.events(s, dir)
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        round(col("value"), 3).as("purchase_value"))
    AsOfJoin.leftAsOf(purchases, views,
        leftKey = "user_id", rightKey = "v_user",
        leftTs = "ts", rightTs = "v_ts",
        rightPayload = Seq("view_id"))
      .select(col("purchase_id"), col("user_id"), col("purchase_value"), col("view_id"))
      .orderBy(col("purchase_id"))
  }.copy(headline = true)

  /** Tolerance as-of join — the "as-of within" variant every
    * time-series store offers: the q09 match is kept only when the
    * matched view is at most 24 h older than the purchase; a staler
    * match nulls the payload exactly like no-match (the operator's
    * documented tolerance semantics; 709 of 1981 purchases keep their
    * view at sf0.01). Oracle: DuckDB ASOF + a CASE on the matched
    * timestamp's age. */
  val q167 = GQuery("q167_asof_tolerance",
    """WITH v AS (
      |  SELECT user_id, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, ts, round(value, 3) AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id AS purchase_id, p.user_id AS user_id,
      |  p.purchase_value AS purchase_value,
      |  CASE WHEN v.ts >= p.ts - INTERVAL 24 HOUR THEN v.view_id END AS view_id
      |FROM p ASOF LEFT JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val events = Tables.events(s, dir)
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        round(col("value"), 3).as("purchase_value"))
    AsOfJoin.leftAsOf(purchases, views,
        leftKey = "user_id", rightKey = "v_user",
        leftTs = "ts", rightTs = "v_ts",
        rightPayload = Seq("view_id"),
        toleranceMs = Some(24L * 3600 * 1000))
      .select(col("purchase_id"), col("user_id"), col("purchase_value"),
        col("view_id"))
      .orderBy(col("purchase_id"))
  }

  /** String-keyed as-of join: same semantics as q09 but the join key is
    * a string ('u<user_id>') — guards the operator's native-key-type
    * handling (a numeric cast would NULL these keys and silently match
    * across users). */
  val q09b = GQuery("q09b_asof_join_string_key",
    """WITH v AS (
      |  SELECT concat('u', CAST(user_id AS VARCHAR)) AS ukey, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY ukey, ts),
      |p AS (
      |  SELECT event_id AS purchase_id, concat('u', CAST(user_id AS VARCHAR)) AS ukey,
      |    ts, round(value, 3) AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id AS purchase_id, p.ukey AS ukey,
      |  p.purchase_value AS purchase_value, v.view_id AS view_id
      |FROM p ASOF LEFT JOIN v ON p.ukey = v.ukey AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val events = Tables.events(s, dir)
    val views = events.filter(col("event_type") === "view")
      .groupBy(concat(lit("u"), col("user_id").cast("string")).as("v_ukey"),
        col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"),
        concat(lit("u"), col("user_id").cast("string")).as("ukey"),
        col("ts"), round(col("value"), 3).as("purchase_value"))
    AsOfJoin.leftAsOf(purchases, views,
        leftKey = "ukey", rightKey = "v_ukey",
        leftTs = "ts", rightTs = "v_ts",
        rightPayload = Seq("view_id"))
      .select(col("purchase_id"), col("ukey"), col("purchase_value"), col("view_id"))
      .orderBy(col("purchase_id"))
  }

  /** INNER as-of join — DuckDB's `ASOF JOIN` default: purchases with no
    * prior view are dropped, not null-padded (q09 keeps them). */
  val q09c = GQuery("q09c_asof_join_inner",
    """WITH v AS (
      |  SELECT user_id, ts, max(event_id) AS view_id
      |  FROM events WHERE event_type = 'view' GROUP BY user_id, ts),
      |p AS (
      |  SELECT event_id AS purchase_id, user_id, ts, round(value, 3) AS purchase_value
      |  FROM events WHERE event_type = 'purchase')
      |SELECT p.purchase_id AS purchase_id, p.user_id AS user_id,
      |  p.purchase_value AS purchase_value, v.view_id AS view_id
      |FROM p ASOF JOIN v ON p.user_id = v.user_id AND p.ts >= v.ts
      |ORDER BY purchase_id""".stripMargin) { (s, dir) =>
    val events = Tables.events(s, dir)
    val views = events.filter(col("event_type") === "view")
      .groupBy(col("user_id").as("v_user"), col("ts").as("v_ts"))
      .agg(max(col("event_id")).as("view_id"))
    val purchases = events.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"),
        round(col("value"), 3).as("purchase_value"))
    AsOfJoin.leftAsOf(purchases, views,
        leftKey = "user_id", rightKey = "v_user",
        leftTs = "ts", rightTs = "v_ts",
        rightPayload = Seq("view_id"), inner = true)
      .select(col("purchase_id"), col("user_id"), col("purchase_value"), col("view_id"))
      .orderBy(col("purchase_id"))
  }

  /** Distinct aggregation (Catalyst expands to a two-phase plan with a
    * partial distinct before the shuffle). */
  val q10 = GQuery("q10_distinct_agg",
    """SELECT l_returnflag,
      |  count(DISTINCT l_suppkey) AS n_supp,
      |  count(DISTINCT l_partkey) AS n_part,
      |  count(*) AS n_rows
      |FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_suppkey")).as("n_supp"),
        countDistinct(col("l_partkey")).as("n_part"),
        count(lit(1)).as("n_rows"))
      .orderBy(col("l_returnflag"))
  }

  /** Approximate distinct via HyperLogLog++ — the 100 TB answer to
    * count(DISTINCT). Estimates differ across engines, so the driver
    * does a rows-only check; exactness is covered by q10. */
  val q10b = GQuery.rowsOnly("q10b_approx_distinct") { (s, dir) =>
    Tables.lineitem(s, dir)
      .groupBy(col("l_returnflag"))
      .agg(approx_count_distinct(col("l_partkey"), 0.01).as("approx_n_part"))
      .orderBy(col("l_returnflag"))
  }

  /** ROLLUP hierarchy totals; NULL group markers coalesced to 'ALL' on
    * both sides so ordering/hashing is stable. */
  val q11 = GQuery("q11_rollup",
    """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
      |  coalesce(l_linestatus, 'ALL') AS linestatus,
      |  round(sum(l_quantity), 2) AS sum_qty,
      |  count(*) AS n_rows
      |FROM lineitem
      |GROUP BY ROLLUP(l_returnflag, l_linestatus)
      |ORDER BY returnflag, linestatus""".stripMargin) { (s, dir) =>
    Tables.lineitem(s, dir)
      .rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(round(sum(col("l_quantity")), 2).as("sum_qty"), count(lit(1)).as("n_rows"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
        coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
        col("sum_qty"), col("n_rows"))
      .orderBy(col("returnflag"), col("linestatus"))
  }

  /** CUBE over order status × priority. */
  val q12 = GQuery("q12_cube",
    """SELECT coalesce(o_orderstatus, 'ALL') AS status,
      |  coalesce(o_orderpriority, 'ALL') AS priority,
      |  count(*) AS n_orders,
      |  round(sum(o_totalprice), 2) AS total_price
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)
      |ORDER BY status, priority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .cube(col("o_orderstatus"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), round(sum(col("o_totalprice")), 2).as("total_price"))
      .select(
        coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
        coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
        col("n_orders"), col("total_price"))
      .orderBy(col("status"), col("priority"))
  }

  /** TPC-H Q5-shaped six-table star join: local-supplier revenue by
    * nation for one region-year. The declarative form is the whole
    * point — Catalyst prunes region→nation→(customer, supplier) down
    * the snowflake, pushes the date filter into the orders scan, and
    * AQE broadcasts every dimension, so lineitem (the 100 TB fact)
    * shuffles at most once; the co-location predicate
    * `c_nationkey = s_nationkey` rides the join, never a post-filter
    * over a wider product. */
  val q189 = GQuery("q189_local_supplier_revenue",
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1997-01-01'
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin) { (s, dir) =>
    val lineitem = Tables.lineitem(s, dir)
    val orders = Tables.orders(s, dir)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp")
        && col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
    val customer = Tables.customer(s, dir)
    val supplier = Tables.supplier(s, dir)
    val nation = Tables.nation(s, dir)
    val region = Tables.region(s, dir).filter(col("r_name") === "ASIA")
    lineitem
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(customer, col("o_custkey") === col("c_custkey"))
      .join(supplier, col("l_suppkey") === col("s_suppkey")
        && col("c_nationkey") === col("s_nationkey"))
      .join(nation, col("s_nationkey") === col("n_nationkey"))
      .join(region, col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"),
        count(lit(1)).as("n_items"))
      .orderBy(col("n_name"))
  }

  /** The SQL face + Catalyst decorrelation: a correlated scalar
    * subquery (each customer against their nation's average balance)
    * submitted as SQL TEXT through `spark.sql` over registered views —
    * the API surface a SQL-first user drives. Catalyst rewrites the
    * correlated subquery into an aggregate + join (no per-row
    * re-execution — the plan contains ONE nation-level aggregate
    * joined back), which is the decorrelation a naive engine lacks. */
  val q199 = GQuery("q199_correlated_subquery",
    """SELECT c_custkey, c_nationkey,
      |  round(c_acctbal, 2) AS acctbal
      |FROM customer c1
      |WHERE c_acctbal > (SELECT 2 * avg(c_acctbal) FROM customer c2
      |                   WHERE c2.c_nationkey = c1.c_nationkey)
      |ORDER BY c_custkey""".stripMargin) { (s, dir) =>
    Tables.customer(s, dir).createOrReplaceTempView("customer_v")
    s.sql("""
      SELECT c_custkey, c_nationkey, round(c_acctbal, 2) AS acctbal
      FROM customer_v c1
      WHERE c_acctbal > (SELECT 2 * avg(c_acctbal) FROM customer_v c2
                         WHERE c2.c_nationkey = c1.c_nationkey)
      ORDER BY c_custkey""")
  }

  /** Share-of-parent rollup: each nation's order revenue as a share
    * of its region's total — the two-level ratio every BI drill-down
    * needs, computed as one base aggregate + one window over the
    * REGION-level frame (25 nations — never a re-aggregation of the
    * fact table), revenue summed on the 1e-2 grid so the shares are
    * ratios of exact integers. */
  val q204 = GQuery("q204_share_of_region",
    """WITH rev AS (
      |  SELECT n.n_name, r.r_name,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev2
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  JOIN region r ON r.r_regionkey = n.n_regionkey
      |  GROUP BY 1, 2)
      |SELECT r_name, n_name, CAST(rev2 AS BIGINT) AS rev2,
      |  CAST(round(1e4 * rev2 / sum(rev2) OVER (PARTITION BY r_name))
      |    AS BIGINT) AS share4
      |FROM rev ORDER BY r_name, n_name""".stripMargin) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(s, dir),
        col("n_nationkey") === col("c_nationkey"))
      .join(Tables.region(s, dir),
        col("r_regionkey") === col("n_regionkey"))
      .groupBy(col("n_name"), col("r_name"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev2"))
    val w = Window.partitionBy(col("r_name"))
    rev.select(col("r_name"), col("n_name"), col("rev2"),
        round(lit(1e4) * col("rev2") / sum(col("rev2")).over(w))
          .cast("long").as("share4"))
      .orderBy(col("r_name"), col("n_name"))
  }

  /** Period-over-period growth: yearly order revenue per nation with
    * the previous year's figure and the growth ratio — one fact
    * aggregate + lag over the (nation, year) frame; growth is a ratio
    * of exact grid integers (null for a nation's first year). Year
    * from epoch-day arithmetic is NOT portable across calendars, so
    * both engines use their date part extraction — identical for
    * civil years. */
  val q206 = GQuery("q206_yoy_growth",
    """WITH rev AS (
      |  SELECT n.n_name, CAST(year(o.o_orderdate) AS BIGINT) AS yr,
      |    sum(CAST(round(o.o_totalprice * 100) AS BIGINT)) AS rev2
      |  FROM orders o
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN nation n ON n.n_nationkey = c.c_nationkey
      |  GROUP BY 1, 2)
      |SELECT n_name, yr, CAST(rev2 AS BIGINT) AS rev2,
      |  CAST(lag(rev2) OVER w AS BIGINT) AS prev_rev2,
      |  CAST(round(1e4 * rev2 / lag(rev2) OVER w) AS BIGINT) AS growth4
      |FROM rev
      |WINDOW w AS (PARTITION BY n_name ORDER BY yr)
      |ORDER BY n_name, yr""".stripMargin) { (s, dir) =>
    val rev = Tables.orders(s, dir)
      .join(Tables.customer(s, dir), col("c_custkey") === col("o_custkey"))
      .join(Tables.nation(s, dir), col("n_nationkey") === col("c_nationkey"))
      .groupBy(col("n_name"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev2"))
    val w = Window.partitionBy(col("n_name")).orderBy(col("yr"))
    rev.select(col("n_name"), col("yr"), col("rev2"),
        lag(col("rev2"), 1).over(w).as("prev_rev2"),
        round(lit(1e4) * col("rev2") / lag(col("rev2"), 1).over(w))
          .cast("long").as("growth4"))
      .orderBy(col("n_name"), col("yr"))
  }

  /** RFM segmentation cube: customers banded by Recency (days from
    * the corpus's last order date), Frequency (order count), and
    * Monetary (lifetime spend on the exact 1e-2 cent grid) — the
    * classic CRM cube, with every band boundary an integer literal so
    * both engines cut identically. */
  val q241 = GQuery("q241_rfm_segments",
    """WITH mx AS (SELECT max(o_orderdate) AS mxd FROM orders),
      |c AS (
      |  SELECT o_custkey, max(o_orderdate) AS last_o,
      |    CAST(count(*) AS BIGINT) AS f,
      |    CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT)
      |      AS m2
      |  FROM orders GROUP BY o_custkey),
      |r AS (
      |  SELECT o_custkey,
      |    CAST(floor(epoch(mxd) / 86400) AS BIGINT)
      |      - CAST(floor(epoch(last_o) / 86400) AS BIGINT) AS rdays,
      |    f, m2
      |  FROM c, mx),
      |seg AS (
      |  SELECT
      |    CASE WHEN rdays <= 180 THEN 0 WHEN rdays <= 720 THEN 1
      |      ELSE 2 END AS r_band,
      |    CASE WHEN f <= 5 THEN 0 WHEN f <= 15 THEN 1 ELSE 2 END AS f_band,
      |    CASE WHEN m2 <= 50000000 THEN 0 WHEN m2 <= 200000000 THEN 1
      |      ELSE 2 END AS m_band,
      |    m2
      |  FROM r)
      |SELECT r_band, f_band, m_band, count(*) AS n_customers,
      |  CAST(sum(m2) AS BIGINT) AS sum_m2
      |FROM seg GROUP BY 1, 2, 3
      |ORDER BY r_band, f_band, m_band""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
    val mx = orders.agg(max(col("o_orderdate")).as("mxd"))
    val c = orders.groupBy("o_custkey")
      .agg(max(col("o_orderdate")).as("last_o"), count(lit(1)).as("f"),
        sum(round(lit(100) * col("o_totalprice")).cast("long")).as("m2"))
    c.crossJoin(broadcast(mx))
      .withColumn("rdays",
        floor(unix_timestamp(col("mxd")) / 86400L)
          - floor(unix_timestamp(col("last_o")) / 86400L))
      .select(
        when(col("rdays") <= 180, 0).when(col("rdays") <= 720, 1)
          .otherwise(2).as("r_band"),
        when(col("f") <= 5, 0).when(col("f") <= 15, 1)
          .otherwise(2).as("f_band"),
        when(col("m2") <= 50000000L, 0).when(col("m2") <= 200000000L, 1)
          .otherwise(2).as("m_band"),
        col("m2"))
      .groupBy("r_band", "f_band", "m_band")
      .agg(count(lit(1)).as("n_customers"), sum(col("m2")).as("sum_m2"))
      .orderBy(col("r_band"), col("f_band"), col("m_band"))
  }

  /** TPC-H Q3-shaped shipping-priority top-k: segment-filtered
    * customers (broadcast) × date-bounded orders × late-shipped
    * lineitems, revenue per order, global top-10 — the
    * filter-pushdown + broadcast-dim + TakeOrdered pattern on the
    * 3-table chain (q189 covers the 6-table star). Dates follow the
    * fixture's 1995–2001 span. */
  val q245 = GQuery("q245_shipping_priority",
    """SELECT l_orderkey,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  o_orderdate, o_orderpriority
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1998-06-01'
      |  AND l_shipdate > TIMESTAMP '1998-06-01'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey LIMIT 10""".stripMargin) {
    (s, dir) =>
    val cust = Tables.customer(s, dir)
      .where(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"))
    val orders = Tables.orders(s, dir)
      .where(col("o_orderdate") < to_timestamp(lit("1998-06-01")))
    val li = Tables.lineitem(s, dir)
      .where(col("l_shipdate") > to_timestamp(lit("1998-06-01")))
    li.join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .agg(round(sum(col("l_extendedprice")
        * (lit(1) - col("l_discount"))), 2).as("revenue"))
      .select(col("l_orderkey"), col("revenue"), col("o_orderdate"),
        col("o_orderpriority"))
      .orderBy(col("revenue").desc, col("l_orderkey"))
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier volume: the 6-table chain
    * (customer ⋈ orders ⋈ lineitem ⋈ supplier ⋈ nation ⋈ region) with
    * the Q5 signature predicate — the supplying nation must EQUAL the
    * customer nation (c_nationkey = s_nationkey), i.e. revenue kept
    * in-region by local fulfilment. Plan shape: the two fact tables
    * (orders, lineitem) shuffle once on orderkey; customer, supplier,
    * nation, region are all broadcast dims, and the locality predicate
    * rides the supplier broadcast join as an equi-condition — no extra
    * shuffle, no theta join. The classic demonstration that a 6-table
    * chain costs ONE fact-fact shuffle when every dimension fits in
    * memory (at 100 TB customer may graduate to a bucketed join; the
    * orders⋈lineitem spine is unchanged). */
  val q263 = GQuery("q263_local_supplier_volume",
    """SELECT n_name,
      |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
      |  count(*) AS n_items
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON l_orderkey = o_orderkey
      |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01'
      |  AND o_orderdate < TIMESTAMP '1999-01-01'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin) { (s, dir) =>
    val orders = Tables.orders(s, dir)
      .where(col("o_orderdate") >= to_timestamp(lit("1996-01-01")) &&
        col("o_orderdate") < to_timestamp(lit("1999-01-01")))
      .select(col("o_orderkey"), col("o_custkey"))
    val asiaNations = Tables.nation(s, dir)
      .join(broadcast(Tables.region(s, dir)
        .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, dir)
      .join(broadcast(asiaNations), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("c_nationkey"), col("n_name"))
    Tables.lineitem(s, dir)
      .join(orders, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.supplier(s, dir)
        .select(col("s_suppkey"), col("s_nationkey"))),
        col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
        .as("revenue"), count(lit(1)).as("n_items"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** Order-to-first-ship latency quantiles per priority: exact p50/p90
    * of the day lag via the grid-cell machinery
    * ([[graft.operators.TextStats.groupQuantiles]] — integer days ride
    * the 1e-4 grid as lag/1e4, recovered exactly, the q174 idiom) —
    * the fulfillment-SLA readout. */
  val q246 = GQuery("q246_ship_latency_quantiles",
    """WITH ld AS (
      |  SELECT l_orderkey,
      |    min(CAST(floor(epoch(l_shipdate) / 86400) AS BIGINT)) AS sd
      |  FROM lineitem GROUP BY l_orderkey),
      |lag_ AS (
      |  SELECT o.o_orderpriority AS grp,
      |    ld.sd - CAST(floor(epoch(o.o_orderdate) / 86400) AS BIGINT)
      |      AS s4
      |  FROM orders o JOIN ld ON ld.l_orderkey = o.o_orderkey),
      |tg AS (SELECT grp, count(*) AS t_g FROM lag_ GROUP BY grp),
      |sc AS (SELECT grp, s4, count(*) AS n FROM lag_ GROUP BY 1, 2),
      |cums AS (
      |  SELECT grp, s4,
      |    sum(n) OVER (PARTITION BY grp ORDER BY s4
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM sc),
      |j AS (SELECT c.grp, c.s4, c.cum, tg.t_g
      |  FROM cums c JOIN tg USING (grp))
      |SELECT grp AS priority, t_g AS n_orders,
      |  min(CASE WHEN cum * 10000 >= t_g * 5000 THEN s4 END) AS p5000,
      |  min(CASE WHEN cum * 10000 >= t_g * 9000 THEN s4 END) AS p9000
      |FROM j GROUP BY 1, 2 ORDER BY priority""".stripMargin) { (s, dir) =>
    val ld = Tables.lineitem(s, dir)
      .groupBy(col("l_orderkey"))
      .agg(min(floor(unix_timestamp(col("l_shipdate")) / 86400L))
        .as("sd"))
    val lags = Tables.orders(s, dir)
      .join(ld, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority").as("grp"),
        ((col("sd") - floor(unix_timestamp(col("o_orderdate")) / 86400L))
          / lit(1e4)).as("lag"))
    graft.operators.TextStats
      .groupQuantiles(lags, "grp", "lag", Seq(5000, 9000))
      .select(col("grp").as("priority"), col("n_rows").as("n_orders"),
        col("p5000"), col("p9000"))
      .orderBy(col("priority"))
  }

  /** Exact 10%-trimmed mean of order value per priority (see
    * [[graft.operators.TextStats.groupTrimmedMean]]): the robust
    * average between q38's exact percentiles and the plain mean —
    * integer trim counts, straddling cells contribute exactly their
    * in-range rows. */
  val q251 = GQuery("q251_trimmed_mean",
    """WITH rows_ AS (
      |  SELECT o_orderpriority AS grp,
      |    CAST(round(1e4 * o_totalprice) AS BIGINT) AS s4
      |  FROM orders WHERE o_totalprice IS NOT NULL),
      |cells AS (SELECT grp, s4, CAST(count(*) AS BIGINT) AS n
      |  FROM rows_ GROUP BY 1, 2),
      |tot AS (SELECT grp, CAST(sum(n) AS BIGINT) AS t,
      |  CAST(floor(sum(n) * 0.1) AS BIGINT) AS k FROM cells GROUP BY grp),
      |cum_ AS (
      |  SELECT grp, s4, n,
      |    CAST(sum(n) OVER (PARTITION BY grp ORDER BY s4
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM cells),
      |j AS (
      |  SELECT c.grp, t, k, s4,
      |    greatest(0, least(cum, t - k) - greatest(cum - n, k)) AS kept
      |  FROM cum_ c JOIN tot USING (grp) WHERE t - 2 * k > 0)
      |SELECT grp AS priority, t AS n_rows, k AS n_trimmed_each,
      |  CAST(round(CAST(sum(s4 * kept) AS DOUBLE) / (t - 2 * k))
      |    AS BIGINT) AS trimmed_mean4
      |FROM j GROUP BY 1, 2, 3 ORDER BY priority""".stripMargin) {
    (s, dir) =>
    graft.operators.TextStats.groupTrimmedMean(
        Tables.orders(s, dir).select(col("o_orderpriority"),
          col("o_totalprice")),
        "o_orderpriority", "o_totalprice", trimPct = 0.1)
      .select(col("grp").as("priority"), col("n_rows"),
        col("n_trimmed_each"), col("trimmed_mean4"))
      .orderBy(col("priority"))
  }

  /** Herfindahl–Hirschman concentration of customer spend within each
    * market segment: Σ share² on the 1e-8 grid (per-customer parts
    * rounded before the order-free sum — the part idiom) plus the
    * effective-competitor count 1/HHI — "is this segment's revenue
    * one whale or a crowd", the q208/q228 concentration family in
    * its antitrust form. */
  val q252 = GQuery("q252_hhi_concentration",
    """WITH sp AS (
      |  SELECT c.c_mktsegment AS seg, o.o_custkey AS cust,
      |    CAST(sum(CAST(round(100 * o_totalprice) AS BIGINT)) AS BIGINT)
      |      AS m2
      |  FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      |  GROUP BY 1, 2),
      |tt AS (SELECT seg, CAST(sum(m2) AS BIGINT) AS s FROM sp GROUP BY seg),
      |parts AS (
      |  SELECT sp.seg,
      |    CAST(round(1e8 * (CAST(m2 AS DOUBLE) * m2
      |      / (CAST(s AS DOUBLE) * s))) AS BIGINT) AS p8
      |  FROM sp JOIN tt USING (seg)),
      |a AS (SELECT seg, count(*) AS n_customers,
      |  CAST(sum(p8) AS BIGINT) AS hhi8 FROM parts GROUP BY seg)
      |SELECT seg AS segment, n_customers, hhi8,
      |  CASE WHEN hhi8 = 0 THEN NULL
      |    ELSE CAST(round(1e4 * (1e8 / hhi8)) AS BIGINT) END AS eff_n4
      |FROM a ORDER BY segment""".stripMargin) { (s, dir) =>
    val sp = Tables.orders(s, dir)
      .join(Tables.customer(s, dir),
        col("c_custkey") === col("o_custkey"))
      .groupBy(col("c_mktsegment").as("seg"), col("o_custkey").as("cust"))
      .agg(sum(round(lit(100) * col("o_totalprice")).cast("long")).as("m2"))
    val tt = sp.groupBy("seg").agg(sum(col("m2")).as("s"))
    sp.join(broadcast(tt), "seg")
      .withColumn("p8", round(lit(1e8) * (col("m2").cast("double")
        * col("m2") / (col("s").cast("double") * col("s")))).cast("long"))
      .groupBy("seg")
      .agg(count(lit(1)).as("n_customers"), sum(col("p8")).as("hhi8"))
      .select(col("seg").as("segment"), col("n_customers"), col("hhi8"),
        when(col("hhi8") === 0L, lit(null).cast("long"))
          .otherwise(round(lit(1e4) * (lit(1e8) / col("hhi8")))
            .cast("long")).as("eff_n4"))
      .orderBy(col("segment"))
  }

  /** Benford first-digit audit of order values — the classic
    * fabricated-numbers screen: observed share of each leading digit
    * (taken STRING-exactly from the cent-grid integer, no float log)
    * against the Benford expectation log₁₀(1+1/d), with the per-digit
    * deviation on the 1e-4 grid. A natural multi-scale money column
    * should hug the curve; flat digits flag synthetic or capped
    * values. */
  val q253 = GQuery("q253_benford_audit",
    """WITH d AS (
      |  SELECT CAST(substr(CAST(CAST(round(100 * o_totalprice) AS BIGINT)
      |    AS VARCHAR), 1, 1) AS BIGINT) AS digit
      |  FROM orders WHERE o_totalprice > 0),
      |c AS (SELECT digit, CAST(count(*) AS BIGINT) AS n
      |  FROM d GROUP BY digit),
      |t AS (SELECT CAST(sum(n) AS BIGINT) AS tot FROM c)
      |SELECT digit, n,
      |  CAST(round(1e4 * (CAST(n AS DOUBLE) / tot)) AS BIGINT) AS share4,
      |  CAST(round(1e4 * (ln(1.0 + 1.0 / digit) / ln(10.0))) AS BIGINT)
      |    AS benford4,
      |  CAST(round(1e4 * (CAST(n AS DOUBLE) / tot)) AS BIGINT)
      |    - CAST(round(1e4 * (ln(1.0 + 1.0 / digit) / ln(10.0)))
      |      AS BIGINT) AS dev4
      |FROM c, t ORDER BY digit""".stripMargin) { (s, dir) =>
    val d = Tables.orders(s, dir)
      .where(col("o_totalprice") > 0)
      .select(substring(round(lit(100) * col("o_totalprice"))
        .cast("long").cast("string"), 1, 1).cast("long").as("digit"))
    val c = d.groupBy("digit").agg(count(lit(1)).as("n"))
    val t = c.agg(sum(col("n")).as("tot"))
    val share4 = round(lit(1e4)
      * (col("n").cast("double") / col("tot"))).cast("long")
    val benford4 = round(lit(1e4)
      * (log(lit(1.0) + lit(1.0) / col("digit")) / log(lit(10.0))))
      .cast("long")
    c.crossJoin(broadcast(t))
      .select(col("digit"), col("n"), share4.as("share4"),
        benford4.as("benford4"), (share4 - benford4).as("dev4"))
      .orderBy(col("digit"))
  }

  val all: Seq[GQuery] =
    Seq(q01, q02, q03, q04, q05, q06, q07, q08, q09, q09b, q09c, q167, q10,
      q10b, q11, q12, q189, q199, q204, q206, q241, q245, q246, q251, q252,
      q253, q263)
}
