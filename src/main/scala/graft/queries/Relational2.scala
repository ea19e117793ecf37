package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Second relational batch: exact percentiles, pivot, outer joins,
  * RANGE window frames.
  */
object Relational2 {

  /** Exact interpolated percentiles per group (both engines use the
    * (n-1)p linear-interpolation definition). */
  val q38 = GQuery("q38_percentiles",
    """SELECT o_orderpriority,
      |  round(quantile_cont(o_totalprice, 0.5), 3) AS p50,
      |  round(quantile_cont(o_totalprice, 0.9), 3) AS p90,
      |  count(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("percentile(o_totalprice, 0.5)"), 3).as("p50"),
        round(expr("percentile(o_totalprice, 0.9)"), 3).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Scale twin of q38: `approx_percentile` (a mergeable t-digest-style
    * sketch, map-side partial like any aggregate) in place of the exact
    * sort-based percentile — the default at 100 TB, where exact
    * percentiles force a per-group sort of everything. Rows-only:
    * sketch estimates are engine-specific by nature. */
  val q38b = GQuery.rowsOnly("q38b_approx_percentiles") { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        round(expr("approx_percentile(o_totalprice, 0.5, 10000)"), 3).as("p50"),
        round(expr("approx_percentile(o_totalprice, 0.9, 10000)"), 3).as("p90"),
        count(lit(1)).as("n"))
      .orderBy(col("o_orderpriority"))
  }

  /** Pivot: order counts by priority × status as columns. */
  val q39 = GQuery("q39_pivot",
    """SELECT o_orderpriority,
      |  count(*) FILTER (WHERE o_orderstatus = 'O') AS n_open,
      |  count(*) FILTER (WHERE o_orderstatus = 'F') AS n_finished,
      |  count(*) FILTER (WHERE o_orderstatus = 'P') AS n_pending
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin) { (s, dir) =>
    Tables.orders(s, dir)
      .groupBy(col("o_orderpriority"))
      .pivot("o_orderstatus", Seq("O", "F", "P"))
      .agg(count(lit(1)))
      .select(col("o_orderpriority"),
        coalesce(col("O"), lit(0L)).as("n_open"),
        coalesce(col("F"), lit(0L)).as("n_finished"),
        coalesce(col("P"), lit(0L)).as("n_pending"))
      .orderBy(col("o_orderpriority"))
  }

  /** Full-outer join of two aggregates (nation-level customer vs
    * supplier presence). */
  val q40 = GQuery("q40_full_outer",
    """SELECT coalesce(cn.nk, sn.nk) AS nkey,
      |  coalesce(n_cust, 0) AS n_cust,
      |  coalesce(n_supp, 0) AS n_supp
      |FROM (SELECT c_nationkey AS nk, count(*) AS n_cust FROM customer GROUP BY 1) cn
      |FULL OUTER JOIN
      |     (SELECT s_nationkey AS nk, count(*) AS n_supp FROM supplier GROUP BY 1) sn
      |  ON cn.nk = sn.nk
      |ORDER BY nkey""".stripMargin) { (s, dir) =>
    val cn = Tables.customer(s, dir).groupBy(col("c_nationkey").as("nk_c"))
      .agg(count(lit(1)).as("n_cust"))
    val sn = Tables.supplier(s, dir).groupBy(col("s_nationkey").as("nk_s"))
      .agg(count(lit(1)).as("n_supp"))
    cn.join(sn, col("nk_c") === col("nk_s"), "full_outer")
      .select(coalesce(col("nk_c"), col("nk_s")).as("nkey"),
        coalesce(col("n_cust"), lit(0L)).as("n_cust"),
        coalesce(col("n_supp"), lit(0L)).as("n_supp"))
      .orderBy(col("nkey"))
  }

  /** RANGE window frame: trailing-30-day spend per customer (event-time
    * range frame on epoch seconds — value-based, not row-based). */
  val q41 = GQuery("q41_range_frame",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY CAST(floor(epoch(o_orderdate)) AS BIGINT)
      |    RANGE BETWEEN 2592000 PRECEDING AND CURRENT ROW), 2) AS spend_30d
      |FROM orders ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(unix_timestamp(col("o_orderdate")))
      .rangeBetween(-2592000L, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("spend_30d"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** The streaming window operator run in batch mode (unified model):
    * oracle-gates `Pipelines.windowedCounts`' window-bucketing logic.
    * Note: in a batch plan the watermark node is eliminated, so the
    * late-drop path is NOT exercised here — that behavior is asserted
    * by StreamingPipelinesSpec's watermark test. */
  val q42 = GQuery("q42_event_time_windows",
    """SELECT date_trunc('hour', ts) AS window_start, event_type, count(*) AS n
      |FROM events
      |GROUP BY window_start, event_type
      |ORDER BY window_start, event_type""".stripMargin) { (s, dir) =>
    graft.streaming.Pipelines.windowedCounts(
        Tables.events(s, dir), "ts", delay = "0 seconds",
        windowDur = "1 hour", keyCols = Seq("event_type"))
      .select(col("window_start"), col("event_type"), col("n"))
      .orderBy(col("window_start"), col("event_type"))
  }

  /** The gap-based `session_window` operator in batch mode, oracle-gated
    * against the classic lag/cumsum sessionization SQL: same boundaries
    * (start = first event, end = last event + gap), same membership
    * (event merges while it lands before the running end). */
  val q46 = GQuery("q46_session_windows",
    """WITH s AS (
      |  SELECT user_id, ts,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |         OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
      |         THEN 1 ELSE 0 END AS new_s
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |g AS (
      |  SELECT user_id, ts,
      |    sum(new_s) OVER (PARTITION BY user_id ORDER BY ts
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      |  FROM s)
      |SELECT user_id,
      |  min(ts) AS session_start,
      |  max(ts) + INTERVAL 30 MINUTE AS session_end,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id, sid
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    graft.streaming.Pipelines.sessionWindowAgg(
        Tables.events(s, dir), "ts", delay = "0 seconds",
        gap = "30 minutes", keyCol = "user_id")
      .orderBy(col("user_id"), col("session_start"))
  }

  val all: Seq[GQuery] = Seq(q38, q38b, q39, q40, q41, q42, q46)
}
