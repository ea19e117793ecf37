package graft.queries

import graft.Tables
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Window-function surface: ranking, running frames, lag/lead, ntile,
  * top-k per group, and batch sessionization (SURVEY.md §2.2).
  *
  * Every window partitions by a key with bounded cardinality per group
  * (customer, user, brand) so a single partition's frame fits in executor
  * memory at scale; none of these sorts is global.
  */
object Windows {

  /** Top-3 orders per customer: the scalable top-k-per-group idiom
    * (row_number + filter) — never a global sort. */
  val q13 = GQuery("q13_topk_per_group",
    """SELECT o_custkey, o_orderkey, round(o_totalprice, 2) AS totalprice, rn
      |FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, dir)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select(col("o_custkey"), col("o_orderkey"),
        round(col("o_totalprice"), 2).as("totalprice"), col("rn"))
      .orderBy(col("o_custkey"), col("rn"))
  }.copy(headline = true)

  /** Running (cumulative) spend per customer — unbounded-preceding row
    * frame. */
  val q14 = GQuery("q14_running_sum",
    """SELECT o_custkey, o_orderkey,
      |  round(sum(o_totalprice) OVER (PARTITION BY o_custkey
      |    ORDER BY o_orderdate, o_orderkey
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_spend
      |FROM orders
      |ORDER BY o_custkey, o_orderkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Tables.orders(s, dir)
      .select(col("o_custkey"), col("o_orderkey"),
        round(sum(col("o_totalprice")).over(w), 2).as("running_spend"))
      .orderBy(col("o_custkey"), col("o_orderkey"))
  }

  /** lag/lead analytics: per-user event value delta. */
  val q15 = GQuery("q15_lag_delta",
    """SELECT event_id, user_id,
      |  round(value - lag(value, 1, 0.0) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id), 3) AS delta
      |FROM events
      |ORDER BY event_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_id"), col("user_id"),
        round(col("value") - lag(col("value"), 1, 0.0).over(w), 3).as("delta"))
      .orderBy(col("event_id"))
  }

  /** rank / dense_rank / ntile over parts within a brand. */
  val q16 = GQuery("q16_rank_ntile",
    """SELECT p_brand, p_partkey,
      |  CAST(rank() OVER w AS INT) AS rnk,
      |  CAST(dense_rank() OVER w AS INT) AS drnk,
      |  CAST(ntile(4) OVER w AS INT) AS quartile
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
      |ORDER BY p_brand, p_partkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("p_brand")).orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  /** Global ORDER BY ... LIMIT — Catalyst plans TakeOrderedAndProject
    * (per-partition top-k + driver merge), not a full sort. */
  val q17 = GQuery("q17_global_topk",
    """SELECT p_partkey, p_name, round(p_retailprice, 2) AS price
      |FROM part
      |ORDER BY p_retailprice DESC, p_partkey
      |LIMIT 10""".stripMargin) { (s, dir) =>
    Tables.part(s, dir)
      .orderBy(col("p_retailprice").desc, col("p_partkey"))
      .limit(10)
      .select(col("p_partkey"), col("p_name"), round(col("p_retailprice"), 2).as("price"))
  }

  /** Batch sessionization: a new session starts after a >30 min gap;
    * classic lag + cumulative-flag-sum rewrite, one shuffle on user_id. */
  val q21 = GQuery("q21_sessionize_batch",
    """WITH g AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         > 1800 THEN 1
      |         WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events)
      |SELECT user_id,
      |  CAST(sum(new_session) AS BIGINT) AS n_sessions,
      |  count(*) AS n_events
      |FROM g GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1).otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"), count(lit(1)).as("n_events"))
      .orderBy(col("user_id"))
  }

  /** Ordered funnel reach (see
    * [[graft.operators.EventOps.funnelReport]]): view → click →
    * purchase with STRICT ordering per user — a purchase before the
    * first view does not count. The oracle replays the
    * min-after-previous-step chain. */
  val q156 = GQuery("q156_funnel",
    """WITH s0 AS (
      |  SELECT user_id, min(ts) AS t0 FROM events
      |  WHERE event_type = 'view' GROUP BY user_id),
      |s1 AS (
      |  SELECT s0.user_id, t0,
      |    min(CASE WHEN e.ts > s0.t0 THEN e.ts END) AS t1
      |  FROM s0 LEFT JOIN events e
      |    ON e.user_id = s0.user_id AND e.event_type = 'click'
      |  GROUP BY s0.user_id, t0),
      |s2 AS (
      |  SELECT s1.user_id, t0, t1,
      |    min(CASE WHEN e.ts > s1.t1 THEN e.ts END) AS t2
      |  FROM s1 LEFT JOIN events e
      |    ON e.user_id = s1.user_id AND e.event_type = 'purchase'
      |  GROUP BY s1.user_id, t0, t1)
      |SELECT * FROM (
      |  SELECT 0 AS step, 'view' AS step_name, count(t0) AS n_users FROM s2
      |  UNION ALL SELECT 1, 'click', count(t1) FROM s2
      |  UNION ALL SELECT 2, 'purchase', count(t2) FROM s2)
      |ORDER BY step""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.funnelReport(Tables.events(s, dir),
        "user_id", "ts", "event_type", Seq("view", "click", "purchase"))
      .orderBy(col("step"))
  }

  /** Event-type transition census (see
    * [[graft.operators.EventOps.transitionCounts]]): first-order
    * Markov counts over each user's (ts, event_id)-ordered stream. */
  val q157 = GQuery("q157_transitions",
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events)
      |SELECT from_type, to_type, count(*) AS n_transitions
      |FROM nxt WHERE to_type IS NOT NULL
      |GROUP BY from_type, to_type
      |ORDER BY from_type, to_type""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.transitionCounts(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"), col("to_type"))
  }

  val all: Seq[GQuery] = Seq(q13, q14, q15, q16, q17, q21, q156, q157)
}
