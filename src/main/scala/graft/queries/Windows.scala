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

  /** Capstone user-journey report: per user, event volume, session
    * count (30-min gap), ordered-funnel stage reached (0–3), and the
    * modal transition — the q21 + q156 + q157 machinery composed into
    * ONE per-user table under ONE oracle. All user-keyed. */
  val q166 = GQuery("q166_user_journey",
    """WITH g AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |         > 1800 THEN 1
      |         WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events),
      |sess AS (
      |  SELECT user_id, CAST(sum(new_session) AS BIGINT) AS n_sessions,
      |    count(*) AS n_events
      |  FROM g GROUP BY user_id),
      |s0 AS (
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
      |  GROUP BY s1.user_id, t0, t1),
      |stage AS (
      |  SELECT sess.user_id,
      |    CAST(CASE WHEN t2 IS NOT NULL THEN 3 WHEN t1 IS NOT NULL THEN 2
      |         WHEN t0 IS NOT NULL THEN 1 ELSE 0 END AS INT) AS funnel_stage
      |  FROM sess LEFT JOIN s2 ON s2.user_id = sess.user_id),
      |tr AS (
      |  SELECT user_id, from_type, to_type, count(*) AS c FROM (
      |    SELECT user_id, event_type AS from_type,
      |      lead(event_type) OVER (PARTITION BY user_id
      |        ORDER BY ts, event_id) AS to_type
      |    FROM events) x WHERE to_type IS NOT NULL
      |  GROUP BY 1, 2, 3),
      |topt AS (
      |  SELECT user_id, from_type, to_type FROM (
      |    SELECT *, row_number() OVER (PARTITION BY user_id
      |      ORDER BY c DESC, from_type, to_type) AS rn FROM tr)
      |  WHERE rn = 1)
      |SELECT sess.user_id, sess.n_events, sess.n_sessions,
      |  stage.funnel_stage,
      |  coalesce(topt.from_type, '-') AS top_from,
      |  coalesce(topt.to_type, '-') AS top_to
      |FROM sess
      |JOIN stage ON stage.user_id = sess.user_id
      |LEFT JOIN topt ON topt.user_id = sess.user_id
      |ORDER BY sess.user_id""".stripMargin) { (s, dir) =>
    import graft.operators.EventOps
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_sec").isNull || col("sec") - col("prev_sec") > 1800, 1)
          .otherwise(0))
      .groupBy(col("user_id"))
      .agg(sum(col("new_session")).as("n_sessions"),
        count(lit(1)).as("n_events"))
    val ft = EventOps.funnelTimes(ev, "user_id", "ts", "event_type",
      Seq("view", "click", "purchase"))
    val stage = sess.select("user_id")
      .join(ft, Seq("user_id"), "left")
      .select(col("user_id"),
        (when(col("t2").isNotNull, 3).when(col("t1").isNotNull, 2)
          .when(col("t0").isNotNull, 1).otherwise(0)).as("funnel_stage"))
    val wt = Window.partitionBy(col("user_id"))
      .orderBy(col("c").desc, col("from_type"), col("to_type"))
    val topt = ev
      .select(col("user_id"), col("event_type").as("from_type"),
        lead(col("event_type"), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("user_id", "from_type", "to_type").agg(count(lit(1)).as("c"))
      .withColumn("rn", row_number().over(wt)).where(col("rn") === 1)
      .select("user_id", "from_type", "to_type")
    sess.join(stage, "user_id")
      .join(topt, Seq("user_id"), "left")
      .select(col("user_id"), col("n_events"), col("n_sessions"),
        col("funnel_stage"),
        coalesce(col("from_type"), lit("-")).as("top_from"),
        coalesce(col("to_type"), lit("-")).as("top_to"))
      .orderBy(col("user_id"))
  }

  /** Peak concurrent sessions (see
    * [[graft.operators.EventOps.peakConcurrency]]): sweep line over
    * the q21 session intervals — the capacity-planning number. The
    * oracle replays islands → intervals → sweep with the same
    * RANGE-frame peer semantics. */
  val q168 = GQuery("q168_peak_concurrency",
    """WITH g AS (
      |  SELECT user_id, ts, event_id,
      |    CASE WHEN lag(ts) OVER w IS NULL
      |      OR CAST(floor(epoch(ts)) AS BIGINT)
      |         - lag(CAST(floor(epoch(ts)) AS BIGINT)) OVER w > 1800
      |      THEN 1 ELSE 0 END AS ns
      |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |si AS (
      |  SELECT user_id, ts,
      |    sum(ns) OVER (PARTITION BY user_id ORDER BY ts, event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |sess AS (
      |  SELECT user_id, sid, min(ts) AS st, max(ts) AS en
      |  FROM si GROUP BY 1, 2),
      |pts AS (
      |  SELECT st AS ts, 1 AS delta FROM sess
      |  UNION ALL SELECT en, -1 FROM sess),
      |run AS (
      |  SELECT ts, delta, sum(delta) OVER (ORDER BY ts, delta DESC) AS cc
      |  FROM pts)
      |SELECT CAST(max_concurrent AS BIGINT) AS max_concurrent,
      |  min(ts) AS at_ts
      |FROM (
      |  SELECT ts, cc, (SELECT max(cc) FROM run WHERE delta = 1)
      |    AS max_concurrent
      |  FROM run WHERE delta = 1)
      |WHERE cc = max_concurrent GROUP BY 1""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val sess = ev
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev", lag(col("sec"), 1).over(w))
      .withColumn("ns",
        when(col("prev").isNull || col("sec") - col("prev") > 1800, 1)
          .otherwise(0))
      .withColumn("sid", sum(col("ns"))
        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy("user_id", "sid")
      .agg(min(col("ts")).as("st"), max(col("ts")).as("en"))
    graft.operators.EventOps.peakConcurrency(sess, "st", "en")
  }

  /** Daily OHLC bars per event type (see
    * [[graft.operators.EventOps.ohlcBars]]): open/high/low/close of
    * `value` per (type, day) from ONE keyed aggregate — min_by/max_by
    * on an exact decimal (micros, id) key, no window, no sort. */
  val q172 = GQuery("q172_ohlc_bars",
    """WITH k AS (
      |  SELECT event_type AS grp,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bkt,
      |    CAST(epoch_us(ts) AS DECIMAL(38,0)) * 10000000 + event_id AS kk,
      |    value AS v
      |  FROM events)
      |SELECT grp, bkt, count(*) AS n,
      |  round(arg_min(v, kk), 3) AS open,
      |  round(max(v), 3) AS high,
      |  round(min(v), 3) AS low,
      |  round(arg_max(v, kk), 3) AS close
      |FROM k GROUP BY grp, bkt
      |ORDER BY grp, bkt""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.ohlcBars(Tables.events(s, dir),
        "event_type", "ts", "event_id", "value")
      .select(col("grp"), col("bkt"), col("n"),
        round(col("open"), 3).as("open"), round(col("high"), 3).as("high"),
        round(col("low"), 3).as("low"), round(col("close"), 3).as("close"))
      .orderBy(col("grp"), col("bkt"))
  }

  /** Cohort retention (see
    * [[graft.operators.EventOps.cohortRetention]]): users by first-
    * active day, counted by day offsets they returned — the retention
    * triangle. */
  val q173 = GQuery("q173_cohort_retention",
    """WITH acts AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bkt
      |  FROM events),
      |first_ AS (SELECT user_id, min(bkt) AS cohort FROM acts GROUP BY user_id)
      |SELECT f.cohort, a.bkt - f.cohort AS "offset", count(*) AS n_users
      |FROM acts a JOIN first_ f USING (user_id)
      |GROUP BY 1, 2 ORDER BY cohort, "offset"""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.cohortRetention(Tables.events(s, dir),
        "user_id", "ts")
      .orderBy(col("cohort"), col("offset"))
  }

  /** Funnel latency quantiles: exact p50/p90 of view→click and
    * view→purchase lag (seconds) over the users who got there —
    * [[graft.operators.EventOps.funnelTimes]] composed with
    * [[graft.operators.TextStats.groupQuantiles]] (integer seconds
    * ride the 1e-4 grid as lag/1e4, recovered exactly by the round).
    * The latency half of the q156 reach report. */
  val q174 = GQuery("q174_funnel_latency",
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
      |  GROUP BY s1.user_id, t0, t1),
      |lags AS (
      |  SELECT 'view_to_click' AS grp,
      |    CAST(floor(epoch(t1)) AS BIGINT)
      |      - CAST(floor(epoch(t0)) AS BIGINT) AS s4
      |  FROM s2 WHERE t1 IS NOT NULL
      |  UNION ALL
      |  SELECT 'view_to_purchase',
      |    CAST(floor(epoch(t2)) AS BIGINT)
      |      - CAST(floor(epoch(t0)) AS BIGINT)
      |  FROM s2 WHERE t2 IS NOT NULL),
      |tg AS (SELECT grp, count(*) AS t_g FROM lags GROUP BY grp),
      |sc AS (SELECT grp, s4, count(*) AS n FROM lags GROUP BY 1, 2),
      |cums AS (
      |  SELECT grp, s4,
      |    sum(n) OVER (PARTITION BY grp ORDER BY s4
      |      ROWS UNBOUNDED PRECEDING) AS cum
      |  FROM sc)
      |SELECT c.grp AS step, tg.t_g AS n_users,
      |  min(CASE WHEN cum * 10000 >= t_g * 5000 THEN s4 END) AS p5000,
      |  min(CASE WHEN cum * 10000 >= t_g * 9000 THEN s4 END) AS p9000
      |FROM cums c JOIN tg USING (grp)
      |GROUP BY 1, 2 ORDER BY step""".stripMargin) { (s, dir) =>
    import graft.operators.{EventOps, TextStats}
    val ft = EventOps.funnelTimes(Tables.events(s, dir), "user_id", "ts",
      "event_type", Seq("view", "click", "purchase"))
    val lags = ft.where(col("t1").isNotNull)
      .select(lit("view_to_click").as("grp"),
        ((unix_timestamp(col("t1")) - unix_timestamp(col("t0")))
          .cast("double") / 1e4).as("lag"))
      .unionAll(ft.where(col("t2").isNotNull)
        .select(lit("view_to_purchase").as("grp"),
          ((unix_timestamp(col("t2")) - unix_timestamp(col("t0")))
            .cast("double") / 1e4).as("lag")))
    TextStats.groupQuantiles(lags, "grp", "lag", Seq(5000, 9000))
      .select(col("grp").as("step"), col("n_rows").as("n_users"),
        col("p5000"), col("p9000"))
      .orderBy(col("step"))
  }

  /** First/last-touch conversion attribution (see
    * [[graft.operators.EventOps.touchAttribution]]): each purchase is
    * credited to the earliest and latest view/click by the same user
    * in the 24 h window strictly before it; no-touch conversions land
    * in `(none)`. The oracle replays the micros·K+idx encoding, the
    * RANGE frame, and the decode verbatim. */
  val q178 = GQuery("q178_touch_attribution",
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS m, event_type,
      |    CAST(round(value * 100) AS BIGINT) AS v2,
      |    CASE event_type WHEN 'view' THEN epoch_us(ts) * 3 + 1
      |                    WHEN 'click' THEN epoch_us(ts) * 3 + 2 END AS te
      |  FROM events),
      |wf AS (
      |  SELECT *,
      |    min(te) OVER (PARTITION BY user_id ORDER BY m
      |      RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS fe,
      |    max(te) OVER (PARTITION BY user_id ORDER BY m
      |      RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING) AS le
      |  FROM e),
      |conv AS (SELECT * FROM wf WHERE event_type = 'purchase'),
      |lab AS (
      |  SELECT v2,
      |    CASE WHEN fe IS NULL THEN '(none)'
      |         WHEN fe % 3 = 1 THEN 'view' ELSE 'click' END AS ft,
      |    CASE WHEN le IS NULL THEN '(none)'
      |         WHEN le % 3 = 1 THEN 'view' ELSE 'click' END AS lt
      |  FROM conv)
      |SELECT model, touch_type, CAST(n_conv AS BIGINT) AS n_conv,
      |  CAST(sum_value2 AS BIGINT) AS sum_value2 FROM (
      |  SELECT 'first' AS model, ft AS touch_type, count(*) AS n_conv,
      |    sum(v2) AS sum_value2 FROM lab GROUP BY ft
      |  UNION ALL
      |  SELECT 'last' AS model, lt AS touch_type, count(*) AS n_conv,
      |    sum(v2) AS sum_value2 FROM lab GROUP BY lt)
      |ORDER BY model, touch_type""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.touchAttribution(Tables.events(s, dir),
        "user_id", "ts", "event_type", "value",
        touchTypes = Seq("view", "click"), convType = "purchase",
        lookbackSec = 86400L)
      .orderBy(col("model"), col("touch_type"))
  }

  /** Top user-journey openings (see
    * [[graft.operators.EventOps.topPaths]]): each user's first five
    * event types as a path string, top 25 by user count. */
  val q181 = GQuery("q181_top_paths",
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS rn
      |  FROM events),
      |p AS (
      |  SELECT user_id,
      |    string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 5 GROUP BY user_id)
      |SELECT path, count(*) AS n_users
      |FROM p GROUP BY path
      |ORDER BY n_users DESC, path LIMIT 25""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.topPaths(Tables.events(s, dir),
      "user_id", "ts", "event_id", "event_type", maxLen = 5, k = 25)
  }

  /** Seasonal traffic heatmap (see
    * [[graft.operators.EventOps.seasonalCensus]]): counts, share, and
    * uniform-week lift per (dow, hour) cell; dow from pure epoch
    * arithmetic so both engines agree on numbering. */
  val q185 = GQuery("q185_seasonal_census",
    """WITH c AS (
      |  SELECT (CAST(floor(epoch(ts) / 86400) AS BIGINT) + 4) % 7 AS dow,
      |    CAST(floor(epoch(ts) / 3600) AS BIGINT) % 24 AS hour
      |  FROM events),
      |g AS (SELECT dow, hour, count(*) AS n FROM c GROUP BY 1, 2),
      |t AS (SELECT count(*) AS t FROM c)
      |SELECT dow, hour, n,
      |  CAST(round(1e4 * n / t) AS BIGINT) AS share4,
      |  CAST(round(1e4 * n * 168 / t) AS BIGINT) AS lift4
      |FROM g, t ORDER BY dow, hour""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.seasonalCensus(Tables.events(s, dir), "ts")
      .orderBy(col("dow"), col("hour"))
  }

  /** EWMA anomaly baseline (see
    * [[graft.operators.EventOps.ewmaBaseline]], α = 1/4): the oracle
    * replays the zero-seeded integer fold with `list_reduce` over the
    * same day spine — recursive arithmetic both engines can run
    * bit-exactly because every step floors on the grid. */
  val q187 = GQuery("q187_ewma_baseline",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |spine AS (SELECT t.etype, d.day FROM types t CROSS JOIN days d),
      |full_ AS (
      |  SELECT s.etype, s.day, coalesce(c.n, 0) AS n
      |  FROM spine s LEFT JOIN c USING (etype, day)),
      |arrs AS (
      |  SELECT etype,
      |    [x.n * 10000 for x in
      |      list_sort(list({'day': day, 'n': n}))] AS n4s,
      |    max_by(n, day) AS n_last, max(day) AS last_day
      |  FROM full_ GROUP BY etype),
      |ew AS (
      |  SELECT etype, last_day, n_last,
      |    list_reduce([CAST(0 AS BIGINT)] || n4s,
      |      (acc, x) -> CAST(floor((acc * 3 + x * 1) / 4) AS BIGINT)) AS ewma4
      |  FROM arrs)
      |SELECT etype, last_day, CAST(n_last AS BIGINT) AS n_last, ewma4,
      |  n_last * 10000 - ewma4 AS dev4
      |FROM ew ORDER BY etype""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.ewmaBaseline(Tables.events(s, dir),
        "ts", "event_type", alphaNum = 1, alphaDen = 4)
      .orderBy(col("etype"))
  }

  /** Basket co-occurrence lift (see
    * [[graft.operators.EventOps.basketLift]]): (user, day) baskets of
    * distinct event types; lift assembled as one integer-count ratio
    * on the grid. */
  val q188 = GQuery("q188_basket_lift",
    """WITH items AS (
      |  SELECT DISTINCT user_id AS uid,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bkt,
      |    event_type AS item
      |  FROM events),
      |tb AS (SELECT count(*) AS t_b FROM
      |  (SELECT DISTINCT uid, bkt FROM items)),
      |ic AS (SELECT item, count(*) AS n_i FROM items GROUP BY item),
      |pr AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_ab
      |  FROM items a JOIN items b ON a.uid = b.uid AND a.bkt = b.bkt
      |  WHERE a.item < b.item GROUP BY 1, 2)
      |SELECT item_a, item_b, n_ab, ia.n_i AS n_a, ib.n_i AS n_b,
      |  CAST(round(1e4 * n_ab * t_b / (ia.n_i * ib.n_i)) AS BIGINT) AS lift4
      |FROM pr
      |JOIN ic ia ON ia.item = item_a
      |JOIN ic ib ON ib.item = item_b
      |CROSS JOIN tb
      |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.basketLift(Tables.events(s, dir),
        "user_id", "ts", "event_type")
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Point-in-time-correct feature assembly (the feature-store
    * cornerstone): for every order, the customer's history STRICTLY
    * BEFORE it — prior order count and prior spend (1e-2 grid) — via
    * one customer-keyed window with an exclusive frame ordered by
    * (date, tie key). Training rows built this way cannot leak the
    * label row's own value or any future activity; the classic bug
    * (inclusive frame / as-of-now aggregate) is exactly what the
    * exclusive `rowsBetween(unboundedPreceding, −1)` forbids. One
    * shuffle, co-partitioned by the entity key at any scale. */
  val q193 = GQuery("q193_pit_features",
    """SELECT o_orderkey,
      |  count(*) OVER w AS prior_orders,
      |  CAST(coalesce(sum(CAST(round(o_totalprice * 100) AS BIGINT))
      |    OVER w, 0) AS BIGINT) AS prior_spend2
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |ORDER BY o_orderkey""".stripMargin) { (s, dir) =>
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, -1)
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        count(lit(1)).over(w).as("prior_orders"),
        coalesce(sum(round(col("o_totalprice") * 100).cast("long")).over(w),
          lit(0L)).as("prior_spend2"))
      .orderBy(col("o_orderkey"))
  }

  /** One-sided CUSUM change-point detection (see
    * [[graft.operators.EventOps.cusum]], slack 0.5 on the grid): the
    * oracle replays the zero-seeded integer recursion with
    * `list_reduce` — elements are pre-shaped as state structs (DuckDB
    * 1.0's reduce requires acc type = element type) with an explicit
    * prepended zero state. */
  val q197 = GQuery("q197_cusum_changepoint",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day, count(*) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |spine AS (SELECT t.etype, d.day FROM types t CROSS JOIN days d),
      |full_ AS (
      |  SELECT s.etype, s.day, coalesce(c.n, 0) AS n
      |  FROM spine s LEFT JOIN c USING (etype, day)),
      |arrs AS (
      |  SELECT etype, count(*) AS n_days, sum(n) AS total,
      |    [x.n * 10000 for x in list_sort(list({'day': day, 'n': n}))]
      |      AS n4s,
      |    [x.day for x in list_sort(list({'day': day, 'n': n}))] AS dayl
      |  FROM full_ GROUP BY etype),
      |t AS (
      |  SELECT etype, n_days,
      |    CAST(floor(total * 10000 / n_days) AS BIGINT) AS target4,
      |    n4s, dayl
      |  FROM arrs),
      |-- DuckDB 1.0's list_reduce mutates multi-field struct
      |-- accumulators IN PLACE between field evaluations (later fields
      |-- see already-updated earlier fields), so the running max /
      |-- argmax cannot ride one struct state; instead the whole CUSUM
      |-- prefix series is materialized via single-field reduces over
      |-- prefixes (n_days² tiny steps) and max/argmax read off the
      |-- series.
      |ser AS (
      |  SELECT etype, n_days, target4, dayl,
      |    [list_reduce([CAST(0 AS BIGINT)] || n4s[1:i],
      |       (a, b) -> greatest(CAST(0 AS BIGINT), a + b - target4 - 5000))
      |     for i in range(1, len(n4s) + 1)] AS cs
      |  FROM t)
      |SELECT etype, CAST(n_days AS BIGINT) AS n_days, target4,
      |  cs[len(cs)] AS final_c4,
      |  list_aggregate(cs, 'max') AS max_c4,
      |  dayl[list_position(cs, list_aggregate(cs, 'max'))] AS max_day
      |FROM ser ORDER BY etype""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.cusum(Tables.events(s, dir),
        "ts", "event_type", slack4 = 5000L)
      .orderBy(col("etype"))
  }

  /** Exact audience overlap (see
    * [[graft.operators.EventOps.audienceOverlap]]): distinct-user
    * overlap and Jaccard per event-type pair. */
  val q198 = GQuery("q198_audience_overlap",
    """WITH m AS (
      |  SELECT DISTINCT user_id AS uid, event_type AS item FROM events),
      |sz AS (SELECT item, count(*) AS n_i FROM m GROUP BY item),
      |pr AS (
      |  SELECT a.item AS item_a, b.item AS item_b, count(*) AS n_both
      |  FROM m a JOIN m b ON a.uid = b.uid
      |  WHERE a.item < b.item GROUP BY 1, 2)
      |SELECT item_a, item_b, n_both, sa.n_i AS n_a, sb.n_i AS n_b,
      |  CAST(round(1e4 * n_both / (sa.n_i + sb.n_i - n_both)) AS BIGINT)
      |    AS jaccard4
      |FROM pr
      |JOIN sz sa ON sa.item = item_a
      |JOIN sz sb ON sb.item = item_b
      |ORDER BY item_a, item_b""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.audienceOverlap(Tables.events(s, dir),
        "user_id", "event_type")
      .orderBy(col("item_a"), col("item_b"))
  }

  /** Distribution-rank window functions: percent_rank and cume_dist
    * per brand (the q16 rank family completed) — both are ratios of
    * exact integers with identical definitions in every SQL engine,
    * snapped once to the grid. */
  val q200 = GQuery("q200_percent_rank",
    """SELECT p_brand, p_partkey,
      |  CAST(round(1e4 * percent_rank() OVER w) AS BIGINT) AS prank4,
      |  CAST(round(1e4 * cume_dist() OVER w) AS BIGINT) AS cume4
      |FROM part
      |WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice, p_partkey)
      |ORDER BY p_brand, p_partkey""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("p_brand"))
      .orderBy(col("p_retailprice"), col("p_partkey"))
    Tables.part(s, dir)
      .select(col("p_brand"), col("p_partkey"),
        round(lit(1e4) * percent_rank().over(w)).cast("long").as("prank4"),
        round(lit(1e4) * cume_dist().over(w)).cast("long").as("cume4"))
      .orderBy(col("p_brand"), col("p_partkey"))
  }

  /** Activity streaks (see
    * [[graft.operators.EventOps.activityStreaks]]): gaps-and-islands
    * via the day − row_number constant-group trick. */
  val q201 = GQuery("q201_activity_streaks",
    """WITH d AS (
      |  SELECT DISTINCT user_id AS uid,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events),
      |g AS (
      |  SELECT uid, day,
      |    day - row_number() OVER (PARTITION BY uid ORDER BY day) AS grp
      |  FROM d),
      |isl AS (
      |  SELECT uid, grp, count(*) AS len, min(day) AS start_day
      |  FROM g GROUP BY 1, 2)
      |SELECT uid AS user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
      |  CAST(max(len) AS BIGINT) AS longest_streak,
      |  arg_min(start_day, (100000 - len) * 10000000 + start_day)
      |    AS streak_start
      |FROM isl GROUP BY uid
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.activityStreaks(Tables.events(s, dir),
        "user_id", "ts")
      .select(col("uid").as("user_id"), col("n_active_days"),
        col("longest_streak"), col("streak_start"))
      .orderBy(col("user_id"))
  }

  /** Inter-arrival gap spectrum per event type: consecutive-event gap
    * seconds bucketed by power of two — the arrival-process
    * fingerprint (a healthy Poisson feed fills a geometric ramp; a
    * batchy upstream shows twin peaks). The bucket is the LENGTH OF
    * THE BINARY REPRESENTATION of the gap (`length(bin(gap))`) —
    * exact integer in both engines where `floor(log2(x))` would ride
    * float boundaries at exact powers of two. */
  val q203 = GQuery("q203_gap_spectrum",
    """WITH g AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |        OVER (PARTITION BY event_type ORDER BY ts, event_id) AS gap
      |  FROM events)
      |SELECT etype,
      |  CAST(length(bin(greatest(gap, 1))) AS BIGINT) AS bucket,
      |  count(*) AS n
      |FROM g WHERE gap IS NOT NULL
      |GROUP BY 1, 2 ORDER BY etype, bucket""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    Tables.events(s, dir)
      .select(col("event_type").as("etype"),
        (unix_timestamp(col("ts"))
          - lag(unix_timestamp(col("ts")), 1).over(w)).as("gap"))
      .where(col("gap").isNotNull)
      .select(col("etype"),
        length(bin(greatest(col("gap"), lit(1L)))).cast("long").as("bucket"))
      .groupBy("etype", "bucket").agg(count(lit(1)).as("n"))
      .orderBy(col("etype"), col("bucket"))
  }

  /** Sessionized bounce rate: the q21 gap-sessionization carried one
    * step further — session ids from the cumulative new-session flag,
    * session lengths from one keyed aggregate, and per user the share
    * of single-event (bounce) sessions on the grid. */
  val q205 = GQuery("q205_bounce_rate",
    """WITH g AS (
      |  SELECT user_id, event_id,
      |    CASE WHEN CAST(floor(epoch(ts)) AS BIGINT)
      |           - lag(CAST(floor(epoch(ts)) AS BIGINT))
      |             OVER w > 1800 THEN 1
      |         WHEN lag(ts) OVER w IS NULL THEN 1
      |         ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sids AS (
      |  SELECT user_id,
      |    sum(new_session) OVER (PARTITION BY user_id
      |      ORDER BY event_id
      |      ROWS UNBOUNDED PRECEDING) AS sid
      |  FROM g),
      |slen AS (
      |  SELECT user_id, sid, count(*) AS len
      |  FROM sids GROUP BY 1, 2)
      |SELECT user_id, count(*) AS n_sessions,
      |  CAST(sum(CASE WHEN len = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_bounces,
      |  CAST(round(1e4 * sum(CASE WHEN len = 1 THEN 1 ELSE 0 END)
      |    / count(*)) AS BIGINT) AS bounce4
      |FROM slen GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    val wCum = Window.partitionBy(col("user_id"))
      .orderBy(col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val slen = Tables.events(s, dir)
      .withColumn("sec", unix_timestamp(col("ts")))
      .withColumn("prev_sec", lag(col("sec"), 1).over(w))
      .withColumn("new_session",
        when(col("prev_sec").isNull
          || col("sec") - col("prev_sec") > 1800, 1L).otherwise(0L))
      .withColumn("sid", sum(col("new_session")).over(wCum))
      .groupBy(col("user_id"), col("sid"))
      .agg(count(lit(1)).as("len"))
    slen.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("len") === 1, 1L).otherwise(0L)).as("n_bounces"),
        round(lit(1e4) * sum(when(col("len") === 1, 1L).otherwise(0L))
          / count(lit(1))).cast("long").as("bounce4"))
      .orderBy(col("user_id"))
  }

  /** Markov next-event backtest (see
    * [[graft.operators.EventOps.markovBacktest]]): per state, the
    * modal-successor prediction from the q157 transition census and
    * its in-sample accuracy — the sequence-model baseline. Ties pick
    * the lexicographically smallest successor (spec-pinned); the
    * oracle replays the argmax with a deterministic row_number. */
  val q213 = GQuery("q213_markov_backtest",
    """WITH nxt AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS to_type
      |  FROM events),
      |tc AS (
      |  SELECT from_type, to_type, CAST(count(*) AS BIGINT) AS n
      |  FROM nxt WHERE to_type IS NOT NULL GROUP BY from_type, to_type),
      |pred AS (
      |  SELECT from_type, to_type AS predicted_next FROM (
      |    SELECT from_type, to_type, row_number() OVER (
      |      PARTITION BY from_type ORDER BY n DESC, to_type) AS rn
      |    FROM tc) WHERE rn = 1)
      |SELECT tc.from_type AS from_type, p.predicted_next AS predicted_next,
      |  CAST(sum(tc.n) AS BIGINT) AS n_transitions,
      |  CAST(sum(CASE WHEN tc.to_type = p.predicted_next THEN tc.n
      |    ELSE 0 END) AS BIGINT) AS n_correct,
      |  CAST(round(1e4 * sum(CASE WHEN tc.to_type = p.predicted_next
      |    THEN tc.n ELSE 0 END) / sum(tc.n)) AS BIGINT) AS acc4
      |FROM tc JOIN pred p USING (from_type)
      |GROUP BY 1, 2 ORDER BY from_type""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.markovBacktest(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("from_type"))
  }

  /** Daily-count autocorrelation per event type, lags 1..7 (see
    * [[graft.operators.EventOps.autocorrelation]]): the periodicity
    * probe on the q187 zero-filled day spine — integer-exact up to one
    * final grid division, which is why the oracle can replay every
    * lag bit-identically. */
  val q214 = GQuery("q214_autocorrelation",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day, coalesce(c.n, 0) AS n
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |ks AS (SELECT CAST(unnest(range(1, 8)) AS BIGINT) AS k),
      |tot AS (
      |  SELECT etype, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS qq,
      |    min(day) AS mind, max(day) AS maxd
      |  FROM full_ GROUP BY etype),
      |ab AS (
      |  SELECT f.etype, k.k,
      |    CAST(sum(CASE WHEN f.day <= tt.maxd - k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS ak,
      |    CAST(sum(CASE WHEN f.day >= tt.mind + k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS bk
      |  FROM full_ f CROSS JOIN ks k JOIN tot tt ON tt.etype = f.etype
      |  GROUP BY 1, 2),
      |ck AS (
      |  SELECT a.etype, k.k, CAST(sum(a.n * b.n) AS BIGINT) AS ck
      |  FROM full_ a CROSS JOIN ks k
      |  JOIN full_ b ON b.etype = a.etype AND b.day = a.day + k.k
      |  GROUP BY 1, 2)
      |SELECT tt.etype AS etype, ck.k AS lag, tt.t - ck.k AS n_pairs,
      |  CAST(round(1e4 * CAST(tt.t * tt.t * ck.ck
      |      - tt.t * tt.s * (ab.ak + ab.bk)
      |      + (tt.t - ck.k) * tt.s * tt.s AS DOUBLE)
      |    / CAST(tt.t * tt.t * tt.qq - tt.t * tt.s * tt.s AS DOUBLE))
      |    AS BIGINT) AS r4
      |FROM ck JOIN ab ON ab.etype = ck.etype AND ab.k = ck.k
      |JOIN tot tt ON tt.etype = ck.etype
      |WHERE tt.t * tt.t * tt.qq - tt.t * tt.s * tt.s > 0
      |ORDER BY etype, lag""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.autocorrelation(Tables.events(s, dir),
        "ts", "event_type", maxLag = 7)
      .orderBy(col("etype"), col("lag"))
  }

  /** Lead–lag cross-correlation matrix between event types (see
    * [[graft.operators.EventOps.crossCorrelation]]), lags 0..7 on the
    * shared day spine — which feeds LEAD which, and by how many days.
    * Same integer-exact scaling as q214; one final double division
    * per (pair, lag). */
  val q218 = GQuery("q218_cross_correlation",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day, coalesce(c.n, 0) AS n
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |ks AS (SELECT CAST(unnest(range(0, 8)) AS BIGINT) AS k),
      |tot AS (
      |  SELECT etype, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS qq,
      |    min(day) AS mind, max(day) AS maxd
      |  FROM full_ GROUP BY etype),
      |ab AS (
      |  SELECT f.etype, k.k,
      |    CAST(sum(CASE WHEN f.day <= tt.maxd - k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS ak,
      |    CAST(sum(CASE WHEN f.day >= tt.mind + k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS bk
      |  FROM full_ f CROSS JOIN ks k JOIN tot tt ON tt.etype = f.etype
      |  GROUP BY 1, 2),
      |ck AS (
      |  SELECT a.etype AS ex, b.etype AS ey, k.k,
      |    CAST(sum(a.n * b.n) AS BIGINT) AS ck
      |  FROM full_ a CROSS JOIN ks k
      |  JOIN full_ b ON b.day = a.day + k.k AND b.etype <> a.etype
      |  GROUP BY 1, 2, 3)
      |SELECT ck.ex AS ex, ck.ey AS ey, ck.k AS lag, tx.t - ck.k AS n_pairs,
      |  CAST(round(1e4 * (CAST(tx.t * tx.t * ck.ck
      |      - tx.t * ty.s * ax.ak
      |      - tx.t * tx.s * yb.bk
      |      + (tx.t - ck.k) * tx.s * ty.s AS DOUBLE)
      |    / sqrt(CAST(tx.t * tx.t * tx.qq - tx.t * tx.s * tx.s AS DOUBLE)
      |      * CAST(tx.t * tx.t * ty.qq - tx.t * ty.s * ty.s AS DOUBLE))))
      |    AS BIGINT) AS r4
      |FROM ck
      |JOIN ab ax ON ax.etype = ck.ex AND ax.k = ck.k
      |JOIN ab yb ON yb.etype = ck.ey AND yb.k = ck.k
      |JOIN tot tx ON tx.etype = ck.ex
      |JOIN tot ty ON ty.etype = ck.ey
      |WHERE tx.t * tx.t * tx.qq - tx.t * tx.s * tx.s > 0
      |  AND tx.t * tx.t * ty.qq - tx.t * ty.s * ty.s > 0
      |ORDER BY ex, ey, lag""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.crossCorrelation(Tables.events(s, dir),
        "ts", "event_type", maxLag = 7)
      .orderBy(col("ex"), col("ey"), col("lag"))
  }

  /** Structural trend break per event type (see
    * [[graft.operators.EventOps.trendBreak]]): the Chow-test sweep
    * over the day spine from prefix/suffix sufficient statistics —
    * best breakpoint, SSE gain, and both segment slopes, all replayed
    * by the oracle from the same integer stats and fixed double
    * shapes. */
  val q222 = {
    def sseSql(n: String, sx: String, sy: String, sxx: String,
               sxy: String, syy: String): String =
      s"""CASE WHEN ($n) <= 1 OR (($n) * ($sxx) - ($sx) * ($sx)) = 0 THEN 0.0
         |  ELSE (CAST(($n) * ($syy) - ($sy) * ($sy) AS DOUBLE)
         |      * (($n) * ($sxx) - ($sx) * ($sx))
         |    - CAST(($n) * ($sxy) - ($sx) * ($sy) AS DOUBLE)
         |      * (($n) * ($sxy) - ($sx) * ($sy)))
         |    / (CAST($n AS DOUBLE) * (($n) * ($sxx) - ($sx) * ($sx))) END"""
        .stripMargin
    def slopeSql(n: String, sx: String, sy: String, sxx: String,
                 sxy: String): String =
      s"""CASE WHEN ($n) <= 1 OR (($n) * ($sxx) - ($sx) * ($sx)) = 0
         |  THEN NULL
         |  ELSE CAST(round(1e6
         |    * CAST(($n) * ($sxy) - ($sx) * ($sy) AS DOUBLE)
         |    / CAST(($n) * ($sxx) - ($sx) * ($sx) AS DOUBLE)) AS BIGINT)
         |END""".stripMargin
    val l = Seq("p.cn", "p.csx", "p.csy", "p.csxx", "p.csxy", "p.csyy")
    val r = Seq("t.tn - p.cn", "t.tsx - p.csx", "t.tsy - p.csy",
      "t.tsxx - p.csxx", "t.tsxy - p.csxy", "t.tsyy - p.csyy")
    val a = Seq("t.tn", "t.tsx", "t.tsy", "t.tsxx", "t.tsxy", "t.tsyy")
    GQuery("q222_trend_break",
      s"""WITH c AS (
         |  SELECT event_type AS etype,
         |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
         |    CAST(count(*) AS BIGINT) AS n
         |  FROM events GROUP BY 1, 2),
         |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
         |  AS day FROM events),
         |types AS (SELECT DISTINCT event_type AS etype FROM events),
         |mind AS (SELECT min(day) AS mind FROM days),
         |full_ AS (
         |  SELECT t.etype, d.day, d.day - m.mind AS x,
         |    coalesce(c.n, 0) AS y
         |  FROM types t CROSS JOIN days d
         |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day, mind m),
         |pre AS (
         |  SELECT etype, day,
         |    CAST(sum(1) OVER wp AS BIGINT) AS cn,
         |    CAST(sum(x) OVER wp AS BIGINT) AS csx,
         |    CAST(sum(y) OVER wp AS BIGINT) AS csy,
         |    CAST(sum(x * x) OVER wp AS BIGINT) AS csxx,
         |    CAST(sum(x * y) OVER wp AS BIGINT) AS csxy,
         |    CAST(sum(y * y) OVER wp AS BIGINT) AS csyy
         |  FROM full_ WINDOW wp AS (PARTITION BY etype ORDER BY x
         |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         |tot AS (
         |  SELECT etype, CAST(count(*) AS BIGINT) AS tn,
         |    CAST(sum(x) AS BIGINT) AS tsx, CAST(sum(y) AS BIGINT) AS tsy,
         |    CAST(sum(x * x) AS BIGINT) AS tsxx,
         |    CAST(sum(x * y) AS BIGINT) AS tsxy,
         |    CAST(sum(y * y) AS BIGINT) AS tsyy
         |  FROM full_ GROUP BY etype),
         |cand AS (
         |  SELECT p.etype, p.day, p.cn, t.tn - p.cn AS nr,
         |    CAST(round(1e4 * (${sseSql(a(0), a(1), a(2), a(3), a(4), a(5))}
         |      - ${sseSql(l(0), l(1), l(2), l(3), l(4), l(5))}
         |      - ${sseSql(r(0), r(1), r(2), r(3), r(4), r(5))}))
         |      AS BIGINT) AS gain4,
         |    ${slopeSql(l(0), l(1), l(2), l(3), l(4))} AS slope_l6,
         |    ${slopeSql(r(0), r(1), r(2), r(3), r(4))} AS slope_r6
         |  FROM pre p JOIN tot t USING (etype) WHERE p.cn < t.tn)
         |SELECT etype, day AS break_day, cn AS n_left, nr AS n_right,
         |  gain4, slope_l6, slope_r6
         |FROM (SELECT *, row_number() OVER (PARTITION BY etype
         |    ORDER BY gain4 DESC, day) AS rk FROM cand)
         |WHERE rk = 1 ORDER BY etype""".stripMargin) { (s, dir) =>
      graft.operators.EventOps.trendBreak(Tables.events(s, dir),
          "ts", "event_type")
        .orderBy(col("etype"))
    }
  }

  /** Theil–Sen robust slope per event type (see
    * [[graft.operators.EventOps.theilSenSlope]]): lower-median of all
    * pairwise day-spine slopes on the 1e-6 grid — the outlier-immune
    * trend estimate beside q194's least squares and q222's break
    * sweep. */
  val q223 = GQuery("q223_theil_sen",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day, coalesce(c.n, 0) AS y
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |pairs AS (
      |  SELECT a.etype,
      |    CAST(round(1e6 * CAST(b.y - a.y AS DOUBLE)
      |      / CAST(b.day - a.day AS DOUBLE)) AS BIGINT) AS s6
      |  FROM full_ a JOIN full_ b ON b.etype = a.etype AND a.day < b.day),
      |cells AS (SELECT etype, s6, CAST(count(*) AS BIGINT) AS m
      |  FROM pairs GROUP BY 1, 2),
      |cum AS (
      |  SELECT etype, s6, m,
      |    CAST(sum(m) OVER (PARTITION BY etype ORDER BY s6
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM cells),
      |tot AS (SELECT etype, CAST(sum(m) AS BIGINT) AS np
      |  FROM cells GROUP BY etype)
      |SELECT c.etype AS etype, t.np AS n_pairs, c.s6 AS ts_slope6
      |FROM cum c JOIN tot t USING (etype)
      |WHERE 2 * c.cum >= t.np AND 2 * (c.cum - c.m) < t.np
      |ORDER BY etype""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.theilSenSlope(Tables.events(s, dir),
        "ts", "event_type")
      .orderBy(col("etype"))
  }

  /** Retention-decay fit per cohort: the q173 retention triangle
    * normalized to day-0 rates (1e-4 grid) and pushed through
    * [[graft.operators.Profiling.groupLinFit]] — slope6 is the decay
    * in retention grid-points per day, r2_4 how linear the die-off is.
    * One-offset cohorts drop (no x variance), matching the operator's
    * contract. */
  val q226 = GQuery("q226_retention_decay",
    """WITH acts AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS bkt
      |  FROM events),
      |first_ AS (SELECT user_id, min(bkt) AS cohort
      |  FROM acts GROUP BY user_id),
      |ret AS (
      |  SELECT f.cohort, a.bkt - f.cohort AS xo,
      |    CAST(count(*) AS BIGINT) AS n_users
      |  FROM acts a JOIN first_ f USING (user_id) GROUP BY 1, 2),
      |n0 AS (SELECT cohort, n_users AS n0 FROM ret WHERE xo = 0),
      |rws AS (
      |  SELECT ret.cohort AS grp, CAST(xo AS BIGINT) AS x,
      |    CAST(round(1e4 * n_users / n0) AS BIGINT) AS y
      |  FROM ret JOIN n0 USING (cohort)),
      |s AS (
      |  SELECT grp, count(*) AS n, sum(x) AS sx, sum(y) AS sy,
      |    sum(x * x) AS sxx, sum(x * y) AS sxy, sum(y * y) AS syy
      |  FROM rws GROUP BY grp)
      |SELECT grp AS cohort, CAST(n AS BIGINT) AS n,
      |  CAST(round(1e6 * CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE)) AS BIGINT) AS slope6,
      |  CAST(round((CAST(sy AS DOUBLE)
      |      - (CAST(n * sxy - sx * sy AS DOUBLE)
      |         / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE)) AS BIGINT) AS intercept,
      |  CAST(CASE WHEN n * syy - sy * sy > 0 THEN
      |    round(1e4 * CAST(n * sxy - sx * sy AS DOUBLE)
      |      * CAST(n * sxy - sx * sy AS DOUBLE)
      |      / (CAST(n * sxx - sx * sx AS DOUBLE)
      |         * CAST(n * syy - sy * sy AS DOUBLE)))
      |    ELSE 10000 END AS BIGINT) AS r2_4
      |FROM s WHERE n * sxx - sx * sx > 0
      |ORDER BY cohort""".stripMargin) { (s, dir) =>
    val ret = graft.operators.EventOps.cohortRetention(
      Tables.events(s, dir), "user_id", "ts")
    val n0 = ret.where(col("offset") === 0)
      .select(col("cohort"), col("n_users").as("n0"))
    val rates = ret.join(n0, "cohort")
      .select(col("cohort"), col("offset").as("x"),
        round(lit(1e4) * col("n_users") / col("n0")).cast("long").as("y"))
    graft.operators.Profiling.groupLinFit(rates, "cohort", "x", "y")
      .select(col("grp").as("cohort"), col("n"), col("slope6"),
        col("intercept"), col("r2_4"))
      .orderBy(col("cohort"))
  }

  /** Feed-health dispersion census (see
    * [[graft.operators.EventOps.dispersionCensus]]): Fano factor,
    * peak-to-mean, and silent-day fraction per event type — three
    * exact integer ratios on the day spine. */
  val q227 = GQuery("q227_dispersion_census",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day, coalesce(c.n, 0) AS n
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |a AS (
      |  SELECT etype, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS qq,
      |    CAST(max(n) AS BIGINT) AS mx,
      |    CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zs
      |  FROM full_ GROUP BY etype)
      |SELECT etype, t AS n_days, s AS total,
      |  CAST(round(1e4 * CAST(t * qq - s * s AS DOUBLE)
      |    / CAST(t * s AS DOUBLE)) AS BIGINT) AS fano4,
      |  CAST(round(1e4 * CAST(mx * t AS DOUBLE) / CAST(s AS DOUBLE))
      |    AS BIGINT) AS peak_ratio4,
      |  CAST(round(1e4 * zs / t) AS BIGINT) AS zero_frac4
      |FROM a WHERE s > 0 ORDER BY etype""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.dispersionCensus(Tables.events(s, dir),
        "ts", "event_type")
      .orderBy(col("etype"))
  }

  /** Session overlap degree (see
    * [[graft.operators.EventOps.overlapDegree]]): for every q46
    * session, how many OTHER users' sessions were concurrent with it —
    * computed with ZERO interval joins via the two boundary sweeps
    * (the q168 two-phase prefix-sum shape), which is the plan that
    * survives a day with 10⁸ overlapping sessions. Touching ends
    * count as overlap (inclusive). */
  val q229 = GQuery("q229_session_overlap",
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
      |  FROM s),
      |iv AS (
      |  SELECT user_id,
      |    user_id * 10000000000 + CAST(floor(epoch(min(ts))) AS BIGINT)
      |      AS id,
      |    min(ts) AS session_start,
      |    CAST(floor(epoch(min(ts))) AS BIGINT) AS st,
      |    CAST(floor(epoch(max(ts) + INTERVAL 30 MINUTE)) AS BIGINT) AS en,
      |    count(*) AS n_events
      |  FROM g GROUP BY user_id, sid),
      |p1 AS (
      |  SELECT st AS v, 0 AS ord, 1 AS delta, NULL AS pid FROM iv
      |  UNION ALL
      |  SELECT en AS v, 1 AS ord, 0 AS delta, id AS pid FROM iv),
      |c1 AS (
      |  SELECT pid, CAST(sum(delta) OVER (ORDER BY v, ord) AS BIGINT)
      |    AS c_le
      |  FROM p1),
      |p2 AS (
      |  SELECT en AS v, 1 AS ord, 1 AS delta, NULL AS pid FROM iv
      |  UNION ALL
      |  SELECT st AS v, 0 AS ord, 0 AS delta, id AS pid FROM iv),
      |c2 AS (
      |  SELECT pid, CAST(sum(delta) OVER (ORDER BY v, ord) AS BIGINT)
      |    AS c_lt
      |  FROM p2)
      |SELECT iv.user_id AS user_id, iv.session_start AS session_start,
      |  iv.n_events AS n_events, c1.c_le - c2.c_lt - 1 AS degree
      |FROM iv JOIN c1 ON c1.pid = iv.id JOIN c2 ON c2.pid = iv.id
      |ORDER BY user_id, session_start""".stripMargin) { (s, dir) =>
    val sess = graft.streaming.Pipelines.sessionWindowAgg(
        Tables.events(s, dir), "ts", delay = "0 seconds",
        gap = "30 minutes", keyCol = "user_id")
      .select(col("user_id"), col("session_start"), col("n_events"),
        (col("user_id") * lit(10000000000L)
          + unix_timestamp(col("session_start"))).as("id"),
        unix_timestamp(col("session_start")).as("st"),
        unix_timestamp(col("session_end")).as("en"))
    graft.operators.EventOps.overlapDegree(sess, "id", "st", "en")
      .select(col("user_id"), col("session_start"), col("n_events"),
        col("degree"))
      .orderBy(col("user_id"), col("session_start"))
  }

  /** Per-user behavioral entropy (see
    * [[graft.operators.EventOps.userEntropy]]): Shannon entropy of
    * each user's event-type mix on the 1e-4 nat grid — the
    * routine-vs-explorer census. */
  val q234 = GQuery("q234_user_entropy",
    """WITH cells AS (
      |  SELECT user_id, event_type AS etype, CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |tot AS (
      |  SELECT user_id, CAST(sum(n) AS BIGINT) AS t,
      |    CAST(count(*) AS BIGINT) AS n_types
      |  FROM cells GROUP BY user_id),
      |parts AS (
      |  SELECT c.user_id, t, n_types,
      |    CAST(round(-1e4 * (CAST(n AS DOUBLE) / t)
      |      * ln(CAST(n AS DOUBLE) / t)) AS BIGINT) AS part4
      |  FROM cells c JOIN tot USING (user_id))
      |SELECT user_id, t AS n_events, n_types,
      |  CAST(sum(part4) AS BIGINT) AS entropy4
      |FROM parts GROUP BY 1, 2, 3 ORDER BY user_id""".stripMargin) {
    (s, dir) =>
    graft.operators.EventOps.userEntropy(Tables.events(s, dir),
        "user_id", "event_type")
      .orderBy(col("user_id"))
  }

  /** Capstone feed-health one-pager: per event type, volume +
    * dispersion (q227) + robust Theil–Sen trend (q223) + best
    * structural break (q222) + autocorrelation at lags 1 and 7 (q214)
    * — the table an ingest-operations review reads, composed from the
    * four audited operators over ONE shared day spine and verified by
    * ONE oracle that replays all four formula families. */
  val q235 = GQuery("q235_feed_health",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day, coalesce(c.n, 0) AS n
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |d_a AS (
      |  SELECT etype, CAST(count(*) AS BIGINT) AS t,
      |    CAST(sum(n) AS BIGINT) AS s, CAST(sum(n * n) AS BIGINT) AS qq,
      |    CAST(max(n) AS BIGINT) AS mx,
      |    CAST(sum(CASE WHEN n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS zs,
      |    min(day) AS mind, max(day) AS maxd
      |  FROM full_ GROUP BY etype),
      |disp AS (
      |  SELECT etype, t AS n_days, s AS total,
      |    CAST(round(1e4 * CAST(t * qq - s * s AS DOUBLE)
      |      / CAST(t * s AS DOUBLE)) AS BIGINT) AS fano4,
      |    CAST(round(1e4 * CAST(mx * t AS DOUBLE) / CAST(s AS DOUBLE))
      |      AS BIGINT) AS peak_ratio4,
      |    CAST(round(1e4 * zs / t) AS BIGINT) AS zero_frac4
      |  FROM d_a WHERE s > 0),
      |tsp AS (
      |  SELECT a.etype,
      |    CAST(round(1e6 * CAST(b.n - a.n AS DOUBLE)
      |      / CAST(b.day - a.day AS DOUBLE)) AS BIGINT) AS s6
      |  FROM full_ a JOIN full_ b ON b.etype = a.etype AND a.day < b.day),
      |tsc AS (SELECT etype, s6, CAST(count(*) AS BIGINT) AS m
      |  FROM tsp GROUP BY 1, 2),
      |tscum AS (
      |  SELECT etype, s6, m,
      |    CAST(sum(m) OVER (PARTITION BY etype ORDER BY s6
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS cum
      |  FROM tsc),
      |tst AS (SELECT etype, CAST(sum(m) AS BIGINT) AS np
      |  FROM tsc GROUP BY etype),
      |tsen AS (
      |  SELECT c.etype, c.s6 AS ts_slope6
      |  FROM tscum c JOIN tst t USING (etype)
      |  WHERE 2 * c.cum >= t.np AND 2 * (c.cum - c.m) < t.np),
      |bfull AS (
      |  SELECT f.etype, f.day, f.day - m.mind AS x, f.n AS y
      |  FROM full_ f, (SELECT min(day) AS mind FROM days) m),
      |bpre AS (
      |  SELECT etype, day,
      |    CAST(sum(1) OVER wp AS BIGINT) AS cn,
      |    CAST(sum(x) OVER wp AS BIGINT) AS csx,
      |    CAST(sum(y) OVER wp AS BIGINT) AS csy,
      |    CAST(sum(x * x) OVER wp AS BIGINT) AS csxx,
      |    CAST(sum(x * y) OVER wp AS BIGINT) AS csxy,
      |    CAST(sum(y * y) OVER wp AS BIGINT) AS csyy
      |  FROM bfull WINDOW wp AS (PARTITION BY etype ORDER BY x
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
      |btot AS (
      |  SELECT etype, CAST(count(*) AS BIGINT) AS tn,
      |    CAST(sum(x) AS BIGINT) AS tsx, CAST(sum(y) AS BIGINT) AS tsy,
      |    CAST(sum(x * x) AS BIGINT) AS tsxx,
      |    CAST(sum(x * y) AS BIGINT) AS tsxy,
      |    CAST(sum(y * y) AS BIGINT) AS tsyy
      |  FROM bfull GROUP BY etype),
      |bcand AS (
      |  SELECT p.etype, p.day,
      |    CAST(round(1e4 * (
      |      CASE WHEN (t.tn) <= 1
      |             OR ((t.tn) * (t.tsxx) - (t.tsx) * (t.tsx)) = 0 THEN 0.0
      |        ELSE (CAST((t.tn) * (t.tsyy) - (t.tsy) * (t.tsy) AS DOUBLE)
      |            * ((t.tn) * (t.tsxx) - (t.tsx) * (t.tsx))
      |          - CAST((t.tn) * (t.tsxy) - (t.tsx) * (t.tsy) AS DOUBLE)
      |            * ((t.tn) * (t.tsxy) - (t.tsx) * (t.tsy)))
      |          / (CAST(t.tn AS DOUBLE)
      |             * ((t.tn) * (t.tsxx) - (t.tsx) * (t.tsx))) END
      |      - CASE WHEN (p.cn) <= 1
      |             OR ((p.cn) * (p.csxx) - (p.csx) * (p.csx)) = 0 THEN 0.0
      |        ELSE (CAST((p.cn) * (p.csyy) - (p.csy) * (p.csy) AS DOUBLE)
      |            * ((p.cn) * (p.csxx) - (p.csx) * (p.csx))
      |          - CAST((p.cn) * (p.csxy) - (p.csx) * (p.csy) AS DOUBLE)
      |            * ((p.cn) * (p.csxy) - (p.csx) * (p.csy)))
      |          / (CAST(p.cn AS DOUBLE)
      |             * ((p.cn) * (p.csxx) - (p.csx) * (p.csx))) END
      |      - CASE WHEN (t.tn - p.cn) <= 1
      |             OR ((t.tn - p.cn) * (t.tsxx - p.csxx)
      |                 - (t.tsx - p.csx) * (t.tsx - p.csx)) = 0 THEN 0.0
      |        ELSE (CAST((t.tn - p.cn) * (t.tsyy - p.csyy)
      |              - (t.tsy - p.csy) * (t.tsy - p.csy) AS DOUBLE)
      |            * ((t.tn - p.cn) * (t.tsxx - p.csxx)
      |               - (t.tsx - p.csx) * (t.tsx - p.csx))
      |          - CAST((t.tn - p.cn) * (t.tsxy - p.csxy)
      |              - (t.tsx - p.csx) * (t.tsy - p.csy) AS DOUBLE)
      |            * ((t.tn - p.cn) * (t.tsxy - p.csxy)
      |               - (t.tsx - p.csx) * (t.tsy - p.csy)))
      |          / (CAST(t.tn - p.cn AS DOUBLE)
      |             * ((t.tn - p.cn) * (t.tsxx - p.csxx)
      |                - (t.tsx - p.csx) * (t.tsx - p.csx))) END))
      |      AS BIGINT) AS gain4
      |  FROM bpre p JOIN btot t USING (etype) WHERE p.cn < t.tn),
      |brk AS (
      |  SELECT etype, day AS break_day, gain4 AS break_gain4
      |  FROM (SELECT *, row_number() OVER (PARTITION BY etype
      |      ORDER BY gain4 DESC, day) AS rk FROM bcand)
      |  WHERE rk = 1),
      |aks AS (SELECT CAST(unnest([1, 7]) AS BIGINT) AS k),
      |aab AS (
      |  SELECT f.etype, k.k,
      |    CAST(sum(CASE WHEN f.day <= tt.maxd - k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS ak,
      |    CAST(sum(CASE WHEN f.day >= tt.mind + k.k THEN f.n ELSE 0 END)
      |      AS BIGINT) AS bk
      |  FROM full_ f CROSS JOIN aks k JOIN d_a tt ON tt.etype = f.etype
      |  GROUP BY 1, 2),
      |ack AS (
      |  SELECT a.etype, k.k, CAST(sum(a.n * b.n) AS BIGINT) AS ck
      |  FROM full_ a CROSS JOIN aks k
      |  JOIN full_ b ON b.etype = a.etype AND b.day = a.day + k.k
      |  GROUP BY 1, 2),
      |acfl AS (
      |  SELECT tt.etype, ack.k,
      |    CAST(round(1e4 * CAST(tt.t * tt.t * ack.ck
      |        - tt.t * tt.s * (aab.ak + aab.bk)
      |        + (tt.t - ack.k) * tt.s * tt.s AS DOUBLE)
      |      / CAST(tt.t * tt.t * tt.qq - tt.t * tt.s * tt.s AS DOUBLE))
      |      AS BIGINT) AS r4
      |  FROM ack JOIN aab ON aab.etype = ack.etype AND aab.k = ack.k
      |  JOIN d_a tt ON tt.etype = ack.etype
      |  WHERE tt.t * tt.t * tt.qq - tt.t * tt.s * tt.s > 0),
      |acf AS (
      |  SELECT etype, max(CASE WHEN k = 1 THEN r4 END) AS r1_4,
      |    max(CASE WHEN k = 7 THEN r4 END) AS r7_4
      |  FROM acfl GROUP BY etype)
      |SELECT d.etype AS etype, d.n_days, d.total, d.fano4, d.peak_ratio4,
      |  d.zero_frac4, tsen.ts_slope6, brk.break_day, brk.break_gain4,
      |  acf.r1_4, acf.r7_4
      |FROM disp d
      |LEFT JOIN tsen USING (etype)
      |LEFT JOIN brk USING (etype)
      |LEFT JOIN acf USING (etype)
      |ORDER BY etype""".stripMargin) { (s, dir) =>
    import graft.operators.EventOps
    val ev = Tables.events(s, dir)
    val disp = EventOps.dispersionCensus(ev, "ts", "event_type")
    val tsen = EventOps.theilSenSlope(ev, "ts", "event_type")
      .select(col("etype"), col("ts_slope6"))
    val brk = EventOps.trendBreak(ev, "ts", "event_type")
      .select(col("etype"), col("break_day"),
        col("gain4").as("break_gain4"))
    val acf = EventOps.autocorrelation(ev, "ts", "event_type", maxLag = 7)
      .where(col("lag").isin(1L, 7L))
      .groupBy("etype")
      .agg(max(when(col("lag") === 1L, col("r4"))).as("r1_4"),
        max(when(col("lag") === 7L, col("r4"))).as("r7_4"))
    disp.join(tsen, Seq("etype"), "left")
      .join(brk, Seq("etype"), "left")
      .join(acf, Seq("etype"), "left")
      .orderBy(col("etype"))
  }

  /** Rolling 7-day reach + DAU/WAU stickiness (see
    * [[graft.operators.EventOps.rollingReach]]): exact rolling
    * distinct via contribution explode — the engagement dashboard
    * triple. */
  val q240 = GQuery("q240_rolling_reach",
    """WITH du AS (
      |  SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    user_id AS u
      |  FROM events),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS wday FROM events),
      |offs AS (SELECT CAST(unnest(range(0, 7)) AS BIGINT) AS o),
      |contrib AS (
      |  SELECT DISTINCT d.wday, du.u
      |  FROM du CROSS JOIN offs o JOIN days d ON d.wday = du.day + o.o),
      |wau AS (SELECT wday, CAST(count(*) AS BIGINT) AS reach
      |  FROM contrib GROUP BY wday),
      |dau AS (SELECT day AS wday, CAST(count(*) AS BIGINT) AS dau
      |  FROM du GROUP BY day)
      |SELECT w.wday AS day, d.dau, w.reach,
      |  CAST(round(1e4 * d.dau / w.reach) AS BIGINT) AS stickiness4
      |FROM wau w JOIN dau d USING (wday) ORDER BY day""".stripMargin) {
    (s, dir) =>
    graft.operators.EventOps.rollingReach(Tables.events(s, dir),
        "user_id", "ts", windowDays = 7)
      .orderBy(col("day"))
  }

  /** Per-user journey log-probability under the corpus bigram LM (see
    * [[graft.operators.EventOps.journeyLogProb]]): the
    * predictable-vs-anomalous path score — q157's transition census
    * turned into a scorer, the behavioral analog of q73. */
  val q244 = GQuery("q244_journey_logprob",
    """WITH nxt AS (
      |  SELECT user_id, event_type AS f,
      |    lead(event_type) OVER (PARTITION BY user_id
      |      ORDER BY ts, event_id) AS t
      |  FROM events),
      |tr AS (SELECT user_id, f, t FROM nxt WHERE t IS NOT NULL),
      |tc AS (SELECT f, t, CAST(count(*) AS BIGINT) AS n
      |  FROM tr GROUP BY 1, 2),
      |ft AS (SELECT f, CAST(sum(n) AS BIGINT) AS tf FROM tc GROUP BY f),
      |v AS (SELECT CAST(count(DISTINCT event_type) AS BIGINT) AS v
      |  FROM events),
      |lm AS (
      |  SELECT tc.f, tc.t,
      |    CAST(round(1e4 * ln(CAST(n + 1 AS DOUBLE) / (tf + v)))
      |      AS BIGINT) AS lp4
      |  FROM tc JOIN ft USING (f), v)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_transitions,
      |  CAST(round(avg(lp4)) AS BIGINT) AS mean_lp4
      |FROM tr JOIN lm USING (f, t)
      |GROUP BY user_id ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.journeyLogProb(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type")
      .orderBy(col("user_id"))
  }

  /** Daily growth accounting (see
    * [[graft.operators.EventOps.growthAccounting]]): the
    * new/retained/resurrected/churned identity every growth dashboard
    * balances, exactly. */
  val q247 = GQuery("q247_growth_accounting",
    """WITH du AS (
      |  SELECT DISTINCT user_id AS u,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day
      |  FROM events),
      |tagged AS (
      |  SELECT u, day, lag(day) OVER (PARTITION BY u ORDER BY day) AS prev
      |  FROM du),
      |cls AS (
      |  SELECT day,
      |    CASE WHEN prev IS NULL THEN 'new'
      |         WHEN prev = day - 1 THEN 'retained'
      |         ELSE 'resurrected' END AS cls
      |  FROM tagged),
      |daily AS (
      |  SELECT day, CAST(count(*) AS BIGINT) AS n_active,
      |    CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_new,
      |    CAST(sum(CASE WHEN cls = 'retained' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_retained,
      |    CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_resurrected
      |  FROM cls GROUP BY day)
      |SELECT day, n_active, n_new, n_retained, n_resurrected,
      |  CASE WHEN lag(day) OVER w = day - 1
      |    THEN lag(n_active) OVER w - n_retained END AS n_churned
      |FROM daily
      |WINDOW w AS (ORDER BY day)
      |ORDER BY day""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.growthAccounting(Tables.events(s, dir),
        "user_id", "ts")
      .orderBy(col("day"))
  }

  /** Day-of-week seasonality profile (see
    * [[graft.operators.EventOps.dowSeasonality]]): the multiplicative
    * weekday index per event type on the zero-filled day spine —
    * 10⁴ = flat, the number a forecaster divides out and an anomaly
    * detector normalizes by before q197's CUSUM sees the series.
    * Weekday is epoch-day mod 7 (engine-neutral; no calendar
    * locale). The oracle replays the spine, the mod-7 bucketing, and
    * the exact integer-product index arithmetic. */
  val q264 = GQuery("q264_dow_seasonality",
    """WITH c AS (
      |  SELECT event_type AS etype,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS day,
      |    CAST(count(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1, 2),
      |days AS (SELECT DISTINCT CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |  AS day FROM events),
      |types AS (SELECT DISTINCT event_type AS etype FROM events),
      |full_ AS (
      |  SELECT t.etype, d.day % 7 AS dow, coalesce(c.n, 0) AS n
      |  FROM types t CROSS JOIN days d
      |  LEFT JOIN c ON c.etype = t.etype AND c.day = d.day),
      |bd AS (
      |  SELECT etype, dow, CAST(count(*) AS BIGINT) AS n_days,
      |    CAST(sum(n) AS BIGINT) AS s
      |  FROM full_ GROUP BY etype, dow),
      |tt AS (
      |  SELECT etype, CAST(sum(n_days) AS BIGINT) AS t,
      |    CAST(sum(s) AS BIGINT) AS tot
      |  FROM bd GROUP BY etype)
      |SELECT bd.etype, CAST(dow AS INT) AS dow, n_days, s AS total,
      |  CAST(round(1e4 * CAST(s * t AS DOUBLE)
      |    / CAST(n_days * tot AS DOUBLE)) AS BIGINT) AS index4,
      |  CAST(round(1e4 * s / tot) AS BIGINT) AS share4
      |FROM bd JOIN tt USING (etype)
      |WHERE tot > 0
      |ORDER BY etype, dow""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.dowSeasonality(Tables.events(s, dir),
        "ts", "event_type")
      .orderBy(col("etype"), col("dow"))
  }

  /** Kaplan–Meier time-to-next-purchase survival (see
    * [[graft.operators.EventOps.kaplanMeier]]): per purchase, hours
    * until the SAME user's next purchase; a user's final purchase is
    * right-censored at the corpus end — the repeat-purchase curve a
    * naive gap histogram gets wrong, because censored gaps must leave
    * the risk set rather than count as conversions. The survival
    * chain runs on a 1e-8 integer grid with per-step round-half-up,
    * and the oracle replays it as a bounded RECURSIVE CTE — a hash
    * match proves the distributed census + driver-side integer fold
    * equals the sequential estimator bit-for-bit, with no exp∘Σlog
    * float drift. */
  val q280 = GQuery("q280_kaplan_meier",
    """WITH RECURSIVE ph AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
      |    event_id
      |  FROM events WHERE event_type = 'purchase'),
      |eh AS (
      |  SELECT CAST(max(floor(epoch(ts) / 3600)) AS BIGINT) AS e
      |  FROM events),
      |lv AS (
      |  SELECT COALESCE(
      |      lead(h) OVER (PARTITION BY user_id ORDER BY h, event_id) - h,
      |      e - h) AS t,
      |    CASE WHEN lead(h) OVER (PARTITION BY user_id
      |      ORDER BY h, event_id) IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM ph CROSS JOIN eh),
      |sp AS (
      |  SELECT t, CAST(count(*) AS BIGINT) AS m,
      |    CAST(sum(ev) AS BIGINT) AS d
      |  FROM lv GROUP BY 1),
      |tot AS (SELECT CAST(sum(m) AS BIGINT) AS n FROM sp),
      |rkk AS (
      |  SELECT t, d,
      |    COALESCE(CAST(sum(m) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS below
      |  FROM sp),
      |st AS (
      |  SELECT t, d, n - below AS r, row_number() OVER (ORDER BY t) AS i
      |  FROM rkk CROSS JOIN tot WHERE d > 0),
      |km(i, s8) AS (
      |  SELECT 0, CAST(100000000 AS HUGEINT)
      |  UNION ALL
      |  SELECT km.i + 1, (2 * km.s8 * (st.r - st.d) + st.r) // (2 * st.r)
      |  FROM km JOIN st ON st.i = km.i + 1)
      |SELECT st.t, st.r AS n_risk, st.d AS d_churn, CAST(km.s8 AS BIGINT)
      |  AS s8
      |FROM st JOIN km ON km.i = st.i ORDER BY st.t""".stripMargin) {
    (s, dir) =>
    val ev = Tables.events(s, dir)
    val ph = ev.where(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 3600L).as("h"), col("event_id"))
    val endH = ev
      .agg(max(floor(unix_timestamp(col("ts")) / 3600L)).as("eh"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("h"), col("event_id"))
    val lives = ph.withColumn("nh", lead(col("h"), 1).over(w))
      .crossJoin(broadcast(endH))
      .select(
        when(col("nh").isNotNull, col("nh") - col("h"))
          .otherwise(col("eh") - col("h")).as("t"),
        col("nh").isNotNull.cast("long").as("ev"))
    graft.operators.EventOps.kaplanMeier(lives, "t", "ev")
      .orderBy(col("t"))
  }

  /** Clamped wallet balance per user (see
    * [[graft.operators.EventOps.clampedBalance]]): purchases credit
    * value-cents, every other event debits them, and the balance
    * floors at zero — the state-dependent fold a windowed cumulative
    * sum cannot express (each step needs the PREVIOUS clamped value).
    * The engine folds per user inside codegen via
    * array_sort ∘ aggregate; the oracle replays the walk as a
    * per-user RECURSIVE CTE — a hash match proves the HOF fold equals
    * the sequential recurrence on every user. */
  val q282 = GQuery("q282_clamped_balance",
    """WITH RECURSIVE r AS (
      |  SELECT user_id,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS i,
      |    CASE WHEN event_type = 'purchase'
      |      THEN CAST(round("value" * 100) AS BIGINT)
      |      ELSE -CAST(round("value" * 100) AS BIGINT) END AS d
      |  FROM events),
      |mx AS (SELECT user_id, CAST(max(i) AS BIGINT) AS n FROM r
      |  GROUP BY 1),
      |walk(user_id, i, bal, clamps, maxb) AS (
      |  SELECT user_id, 0, CAST(0 AS BIGINT), CAST(0 AS BIGINT),
      |    CAST(0 AS BIGINT)
      |  FROM mx
      |  UNION ALL
      |  SELECT w.user_id, w.i + 1,
      |    greatest(w.bal + r.d, 0),
      |    w.clamps + CASE WHEN w.bal + r.d < 0 THEN 1 ELSE 0 END,
      |    greatest(w.maxb, greatest(w.bal + r.d, 0))
      |  FROM walk w JOIN r ON r.user_id = w.user_id AND r.i = w.i + 1)
      |SELECT w.user_id, mx.n AS n_events, w.bal AS final_bal,
      |  w.clamps AS n_clamped, w.maxb AS max_bal
      |FROM walk w JOIN mx ON mx.user_id = w.user_id AND w.i = mx.n
      |ORDER BY w.user_id""".stripMargin) { (s, dir) =>
    val d = Tables.events(s, dir)
      .withColumn("d",
        when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))
          .otherwise(-round(col("value") * 100).cast("long")))
    graft.operators.EventOps.clampedBalance(d, "user_id", "ts",
        "event_id", "d")
      .orderBy(col("user_id"))
  }

  /** Per-user daily series with calendar gap fill (see
    * [[graft.operators.EventOps.gapFillLocf]]): every day in each
    * user's active span materialized, missing days carried forward
    * from the last observed daily total — the sparse-log-to-dense-
    * series transform. The oracle replays the per-key generate_series
    * spine, the left join, and the IGNORE NULLS forward fill. */
  val q293 = GQuery("q293_gap_fill_locf",
    """WITH daily AS (
      |  SELECT user_id AS k, CAST(floor(epoch(ts) / 86400) AS BIGINT)
      |      AS d,
      |    CAST(sum(CAST(round("value" * 100) AS BIGINT)) AS BIGINT)
      |      AS day_total,
      |    CAST(count(*) AS BIGINT) AS n_events
      |  FROM events GROUP BY 1, 2),
      |sp AS (
      |  SELECT k, unnest(generate_series(min(d), max(d))) AS d
      |  FROM daily GROUP BY k),
      |j AS (
      |  SELECT sp.k, sp.d, daily.n_events, daily.day_total
      |  FROM sp LEFT JOIN daily ON daily.k = sp.k AND daily.d = sp.d)
      |SELECT k AS user_id, d, COALESCE(n_events, 0) AS n_events,
      |  day_total,
      |  last_value(day_total IGNORE NULLS) OVER (PARTITION BY k
      |    ORDER BY d ROWS UNBOUNDED PRECEDING) AS filled_total,
      |  (day_total IS NULL) AS is_gap
      |FROM j ORDER BY user_id, d""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.gapFillLocf(Tables.events(s, dir),
        "user_id", "ts", "value")
      .orderBy(col("user_id"), col("d"))
  }

  /** Relational division — "customers who ordered at EVERY priority":
    * the classic FOR ALL query (suppliers stocking every part,
    * students passing every course) that SQL lacks an operator for;
    * the census form (count distinct per customer == corpus-wide
    * count distinct) is its standard reduction, and every piece is an
    * ordinary keyed aggregate. Selective on this data (roughly half
    * the customers cover all five priorities). */
  val q294 = GQuery("q294_relational_division",
    """WITH t AS (
      |  SELECT CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS nt
      |  FROM orders),
      |u AS (
      |  SELECT o_custkey,
      |    CAST(count(DISTINCT o_orderpriority) AS BIGINT) AS k
      |  FROM orders GROUP BY 1)
      |SELECT o_custkey, k AS n_priorities FROM u CROSS JOIN t
      |WHERE k = nt ORDER BY o_custkey""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
    val t = o.agg(countDistinct(col("o_orderpriority")).as("nt"))
    o.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n_priorities"))
      .crossJoin(broadcast(t))
      .where(col("n_priorities") === col("nt"))
      .select(col("o_custkey"), col("n_priorities"))
      .orderBy(col("o_custkey"))
  }

  /** Daily TWAP per event type (see
    * [[graft.operators.EventOps.twap]]): time-weighted average of the
    * value polyline within each (event_type, day) — the
    * irregular-sampling-fair mean where a plain average over-weights
    * bursts. The oracle replays the cents grid, the per-bucket lead,
    * the 128-bit trapezoid sum, the shared IEEE division, and the
    * single-event fallback. */
  val q288 = GQuery("q288_daily_twap",
    """WITH r AS (
      |  SELECT event_type AS grp, CAST(floor(epoch(ts)) AS BIGINT)
      |      AS sec,
      |    event_id, CAST(round("value" * 100) AS BIGINT) AS c,
      |    CAST(floor(floor(epoch(ts)) / 86400) AS BIGINT) AS bkt
      |  FROM events),
      |l AS (
      |  SELECT grp, bkt, sec, c, lead(sec) OVER w AS ns,
      |    lead(c) OVER w AS nc
      |  FROM r WINDOW w AS (PARTITION BY grp, bkt ORDER BY sec, event_id)),
      |f AS (
      |  SELECT grp, bkt, c AS c0 FROM (
      |    SELECT grp, bkt, c, row_number() OVER (PARTITION BY grp, bkt
      |      ORDER BY sec, event_id) AS rn FROM r)
      |  WHERE rn = 1),
      |a AS (
      |  SELECT grp, bkt, CAST(count(*) AS BIGINT) AS n_events,
      |    CAST(max(sec) - min(sec) AS BIGINT) AS span_s,
      |    CAST(sum(CASE WHEN ns IS NOT NULL
      |      THEN CAST((c + nc) * (ns - sec) AS HUGEINT)
      |      ELSE 0 END) AS HUGEINT) AS a2
      |  FROM l GROUP BY 1, 2)
      |SELECT a.grp AS event_type, a.bkt AS bkt, n_events, span_s,
      |  CASE WHEN span_s = 0 THEN c0
      |    ELSE CAST(floor((2 * CAST(a2 AS BIGINT) + 2 * span_s)
      |      / (4 * span_s)) AS BIGINT) END AS twap2
      |FROM a JOIN f ON f.grp = a.grp AND f.bkt = a.bkt
      |ORDER BY event_type, bkt""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.twap(Tables.events(s, dir), "event_type",
        "ts", "event_id", "value", bucketSeconds = 86400L)
      .select(col("grp").as("event_type"), col("bkt"), col("n_events"),
        col("span_s"), col("twap2"))
      .orderBy(col("event_type"), col("bkt"))
  }

  /** Per-user funnel-pattern census (see
    * [[graft.operators.EventOps.sequencePatternCensus]]): how many
    * times each user ran view → … → click → … → purchase with no
    * intervening purchase — the MATCH_RECOGNIZE-shaped sequence
    * question, answered by one ordered string build per user and a
    * regex count. The oracle rebuilds the ordered initial string with
    * string_agg and counts with its own regex engine — a hash match
    * pins the two engines' non-overlapping match semantics to each
    * other on this pattern. */
  val q301 = GQuery("q301_sequence_pattern",
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
      |      AS seq
      |  FROM events GROUP BY user_id)
      |SELECT user_id, CAST(length(seq) AS BIGINT) AS seq_len,
      |  CAST(len(regexp_extract_all(seq, 'v[^p]*c[^p]*p')) AS BIGINT)
      |    AS n_matches
      |FROM s ORDER BY user_id""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.sequencePatternCensus(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type", "v[^p]*c[^p]*p")
      .orderBy(col("user_id"))
  }

  /** Delta-method CI for purchase-cents-per-event between the md5-coin
    * arms (see [[graft.operators.EventOps.ratioDeltaCi]]): the pooled
    * ratio Σy/Σx with its linearized standard error — the correct
    * readout for a ratio metric, where mean-of-per-user-ratios is
    * biased; on a hash coin the intervals should overlap (a perpetual
    * A/A). The oracle replays the per-user sums, the 128-bit moments,
    * and the one delta-method expression. */
  val q302 = GQuery("q302_ratio_delta_ci",
    """WITH a AS (
      |  SELECT user_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS variant
      |  FROM (SELECT DISTINCT user_id FROM events)),
      |u AS (
      |  SELECT a.variant, e.user_id,
      |    CAST(count(*) AS BIGINT) AS x,
      |    CAST(COALESCE(sum(CASE WHEN e.event_type = 'purchase'
      |      THEN CAST(round(e.value * 100) AS BIGINT) END), 0) AS BIGINT)
      |      AS y
      |  FROM events e JOIN a USING (user_id)
      |  GROUP BY 1, 2),
      |g AS (
      |  SELECT variant, CAST(count(*) AS BIGINT) AS n,
      |    CAST(sum(x) AS BIGINT) AS sx, CAST(sum(y) AS BIGINT) AS sy,
      |    CAST(sum(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx,
      |    CAST(sum(CAST(y AS HUGEINT) * y) AS HUGEINT) AS syy,
      |    CAST(sum(CAST(x AS HUGEINT) * y) AS HUGEINT) AS sxy
      |  FROM u GROUP BY 1),
      |d AS (
      |  SELECT variant, n,
      |    CAST(sy AS DOUBLE) / sx AS r,
      |    CAST(sx AS DOUBLE) / n AS mx,
      |    (CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE) * sy / n) / n AS vy,
      |    (CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE) * sx / n) / n AS vx,
      |    (CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE) * sy / n) / n AS cxy
      |  FROM g),
      |e AS (
      |  SELECT variant, n, r,
      |    sqrt((vy - 2.0 * r * cxy + r * r * vx) / (n * mx * mx)) AS se
      |  FROM d)
      |SELECT variant, n AS n_users,
      |  CAST(round(1e4 * r) AS BIGINT) AS ratio4,
      |  CAST(round(1e6 * se) AS BIGINT) AS se6,
      |  CAST(round(1e4 * (r - 1.96 * se)) AS BIGINT) AS ci_lo4,
      |  CAST(round(1e4 * (r + 1.96 * se)) AS BIGINT) AS ci_hi4
      |FROM e ORDER BY variant""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val assign = ev.select(col("user_id")).distinct()
      .withColumn("variant",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)))
    val u = ev.join(assign, "user_id")
      .groupBy(col("variant"), col("user_id"))
      .agg(count(lit(1)).as("x"),
        coalesce(sum(when(col("event_type") === "purchase",
          round(col("value") * 100).cast("long"))), lit(0L)).as("y"))
    graft.operators.EventOps.ratioDeltaCi(u, "variant", "x", "y")
      .orderBy(col("variant"))
  }

  /** Holt linear forecast of daily event volume per type (see
    * [[graft.operators.EventOps.holtForecast]], α=0.3 β=0.2, 7-day
    * horizon): the level+trend smoother on the exact 1e-4 grid with
    * floor-division round-half-up — the oracle replays the zero-filled
    * spine and EVERY recursion step as a per-group RECURSIVE CTE, so a
    * hash match proves the driver fold equals the sequential
    * recurrence, negative trends included. */
  val q299 = {
    // exact FLOOR division by 20 in SQL: DuckDB's `//` truncates
    // toward zero, which disagrees with floorDiv on the negative
    // numerators a falling trend produces — subtract the non-negative
    // remainder first, then the division is exact
    def fd(num: String) =
      s"(($num) - ((($num) % 20) + 20) % 20) // 20"
    GQuery("q299_holt_forecast",
    s"""WITH RECURSIVE dd AS (
      |  SELECT event_type AS grp,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |sp AS (SELECT CAST(min(d) AS BIGINT) AS d0,
      |  CAST(max(d) AS BIGINT) AS d1 FROM dd),
      |gs AS (SELECT DISTINCT grp FROM dd),
      |spine AS (
      |  SELECT grp, unnest(generate_series(d0, d1)) AS d
      |  FROM gs CROSS JOIN sp),
      |ser AS (
      |  SELECT spine.grp, spine.d, COALESCE(c.y, 0) AS y,
      |    CAST(row_number() OVER (PARTITION BY spine.grp
      |      ORDER BY spine.d) - 1 AS BIGINT) AS i
      |  FROM spine LEFT JOIN (
      |    SELECT grp, d, CAST(count(*) AS BIGINT) AS y
      |    FROM dd GROUP BY 1, 2) c
      |    ON c.grp = spine.grp AND c.d = spine.d),
      |mx AS (SELECT grp, CAST(max(i) AS BIGINT) AS t FROM ser GROUP BY 1),
      |walk(grp, i, l, b) AS (
      |  SELECT grp, CAST(1 AS BIGINT), CAST(l1 AS HUGEINT),
      |    CAST(${fd("4 * (l1 - l0) + 16 * b0 + 10")} AS HUGEINT)
      |  FROM (
      |    SELECT a.grp, a.y * 10000 AS l0, (b1.y - a.y) * 10000 AS b0,
      |      ${fd("""6 * b1.y * 10000
      |        + 14 * (a.y * 10000 + (b1.y - a.y) * 10000) + 10""")} AS l1
      |    FROM ser a JOIN ser b1 ON b1.grp = a.grp AND b1.i = 1
      |    WHERE a.i = 0)
      |  UNION ALL
      |  SELECT grp, i, CAST(l2 AS HUGEINT),
      |    CAST(${fd("4 * (l2 - l_old) + 16 * b_old + 10")} AS HUGEINT)
      |  FROM (
      |    SELECT w.grp, w.i + 1 AS i,
      |      ${fd("6 * y.y * 10000 + 14 * (w.l + w.b) + 10")} AS l2,
      |      w.l AS l_old, w.b AS b_old
      |    FROM walk w JOIN ser y ON y.grp = w.grp AND y.i = w.i + 1)),
      |fin AS (
      |  SELECT w.grp, w.l, w.b FROM walk w
      |  JOIN mx ON mx.grp = w.grp AND w.i = mx.t)
      |SELECT grp, CAST(h AS BIGINT) AS h, CAST(l AS BIGINT) AS level4,
      |  CAST(b AS BIGINT) AS trend4,
      |  CAST(l + h * b AS BIGINT) AS forecast4
      |FROM fin CROSS JOIN (SELECT unnest(generate_series(1, 7)) AS h)
      |ORDER BY grp, h""".stripMargin) { (s, dir) =>
      graft.operators.EventOps.holtForecast(Tables.events(s, dir),
          "ts", "event_type", horizon = 7)
        .orderBy(col("grp"), col("h"))
    }
  }

  /** Hampel despiking of daily event volume per type (see
    * [[graft.operators.EventOps.hampelFilter]]): each day judged
    * against its ±3-day window's lower median with the grid-snapped
    * 4.4478·MAD threshold — the robust anomaly flag a rolling mean/σ
    * rule gets poisoned on. The oracle replays the zero-filled spine,
    * the windowed sorted arrays, both lower medians, and the integer
    * threshold compare. */
  val q300 = GQuery("q300_hampel_filter",
    """WITH dd AS (
      |  SELECT event_type AS grp,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |sp AS (SELECT CAST(min(d) AS BIGINT) AS d0,
      |  CAST(max(d) AS BIGINT) AS d1 FROM dd),
      |gs AS (SELECT DISTINCT grp FROM dd),
      |spine AS (
      |  SELECT grp, unnest(generate_series(d0, d1)) AS d
      |  FROM gs CROSS JOIN sp),
      |ser AS (
      |  SELECT spine.grp, spine.d, COALESCE(c.y, 0) AS y
      |  FROM spine LEFT JOIN (
      |    SELECT grp, d, CAST(count(*) AS BIGINT) AS y
      |    FROM dd GROUP BY 1, 2) c
      |    ON c.grp = spine.grp AND c.d = spine.d),
      |win AS (
      |  SELECT grp, d, y,
      |    list_sort(list(y) OVER (PARTITION BY grp ORDER BY d
      |      ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)) AS arr
      |  FROM ser),
      |m AS (
      |  SELECT grp, d, y, arr,
      |    arr[(len(arr) + 1) // 2] AS med
      |  FROM win),
      |md AS (
      |  SELECT grp, d, y, med,
      |    list_sort(list_transform(arr, v -> abs(v - med)))
      |      [(len(arr) + 1) // 2] AS mad
      |  FROM m)
      |SELECT grp, d, y, CAST(med AS BIGINT) AS med,
      |  CAST(mad AS BIGINT) AS mad,
      |  (abs(y - med) * 10000 > 44478 * mad) AS is_outlier
      |FROM md ORDER BY grp, d""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.hampelFilter(Tables.events(s, dir),
        "ts", "event_type")
      .orderBy(col("grp"), col("d"))
  }

  /** Markov removal-effect attribution (see
    * [[graft.operators.EventOps.markovAttribution]]): journeys →
    * transition chain → how much START→CONV absorption drops when
    * each channel is removed — the data-driven credit q178's
    * first/last-touch heuristics cannot give. The oracle replays the
    * journey split, the transition census, and EVERY grid fixpoint
    * iteration of all five scenarios (base + one per channel) as a
    * generated chained-CTE ladder in exact HUGEINT arithmetic. */
  val q298 = {
    val Channels = Seq("click", "error", "signup", "view")
    val Iters = 20
    def ladder(tag: String, removed: Option[String]): String = {
      val a0 =
        s"a${tag}_0 AS MATERIALIZED (SELECT s, CAST(0 AS HUGEINT) AS a FROM sts)"
      val its = (1 to Iters).map { i =>
        val prev = s"a${tag}_${i - 1}"
        val remFilter =
          removed.map(r => s" AND cn.dst <> '$r'").getOrElse("")
        s"""a${tag}_$i AS MATERIALIZED (
           |  SELECT rs.s,
           |    CAST((2 * (COALESCE(x.acc, 0)
           |        + COALESCE(cv.n, 0) * 100000000) + rs.rs)
           |      // (2 * rs.rs) AS HUGEINT) AS a
           |  FROM rs
           |  LEFT JOIN (
           |    SELECT cn.src AS s, sum(CAST(cn.n AS HUGEINT) * p.a) AS acc
           |    FROM cn JOIN $prev p ON p.s = cn.dst
           |    WHERE cn.dst NOT IN ('CONV', 'NULL')$remFilter
           |    GROUP BY cn.src) x ON x.s = rs.s
           |  LEFT JOIN (SELECT src AS s, n FROM cn WHERE dst = 'CONV') cv
           |    ON cv.s = rs.s)""".stripMargin
      }
      (a0 +: its).mkString(",\n")
    }
    val scenarios = ladder("b", None) + ",\n" +
      Channels.zipWithIndex.map { case (c, i) =>
        ladder(s"c$i", Some(c))
      }.mkString(",\n")
    val resRows = Channels.zipWithIndex.map { case (c, i) =>
      s"""SELECT '$c' AS channel,
         |  (SELECT a FROM ab_$Iters WHERE s = 'START') AS base,
         |  (SELECT a FROM ac${i}_$Iters WHERE s = 'START') AS rem"""
        .stripMargin
    }.mkString("\n  UNION ALL ")
    GQuery("q298_markov_attribution",
      s"""WITH b AS (
         |  SELECT user_id AS u, ts, event_id AS tie, event_type AS et,
         |    COALESCE(CAST(sum(CASE WHEN event_type = 'purchase'
         |      THEN 1 ELSE 0 END) OVER (PARTITION BY user_id
         |      ORDER BY ts, event_id
         |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
         |      AS BIGINT), 0) AS jid
         |  FROM events),
         |tr AS (
         |  SELECT COALESCE(lag(et) OVER w, 'START') AS src,
         |    CASE WHEN et = 'purchase' THEN 'CONV' ELSE et END AS dst
         |  FROM b WINDOW w AS (PARTITION BY u, jid ORDER BY ts, tie)),
         |tl AS (
         |  SELECT et AS src, 'NULL' AS dst FROM (
         |    SELECT et, row_number() OVER (PARTITION BY u, jid
         |      ORDER BY ts DESC, tie DESC) AS rn FROM b)
         |  WHERE rn = 1 AND et <> 'purchase'),
         |cn AS MATERIALIZED (
         |  SELECT src, dst, CAST(count(*) AS BIGINT) AS n
         |  FROM (SELECT src, dst FROM tr UNION ALL SELECT src, dst FROM tl)
         |  GROUP BY 1, 2),
         |rs AS MATERIALIZED (SELECT src AS s, CAST(sum(n) AS BIGINT) AS rs
         |       FROM cn GROUP BY 1),
         |sts AS MATERIALIZED (
         |  SELECT 'START' AS s
         |  UNION ALL
         |  SELECT unnest([${Channels.map("'" + _ + "'").mkString(", ")}])),
         |$scenarios,
         |res AS (
         |  $resRows),
         |tot AS (SELECT CAST(sum(base - rem) AS HUGEINT) AS resum
         |        FROM res)
         |SELECT channel, CAST(base AS BIGINT) AS base_conv8,
         |  CAST(rem AS BIGINT) AS removed_conv8,
         |  CAST(base - rem AS BIGINT) AS removal_effect8,
         |  CASE WHEN resum > 0
         |    THEN CAST((2 * (base - rem) * 1000000 + resum)
         |      // (2 * resum) AS BIGINT)
         |    ELSE 0 END AS share6
         |FROM res CROSS JOIN tot ORDER BY channel""".stripMargin) {
      (s, dir) =>
      graft.operators.EventOps.markovAttribution(Tables.events(s, dir),
          "user_id", "ts", "event_id", "event_type", "purchase",
          iters = Iters)
        .orderBy(col("channel"))
    }
  }

  /** Log-rank comparison of repeat-purchase survival between the
    * md5-coin arms (see [[graft.operators.EventOps.logRank]]): are
    * the two arms' time-to-next-purchase curves the same — the
    * significance test q280's estimator needs, and on a hash coin a
    * perpetual A/A check (|z4| should stay small). The oracle replays
    * the per-arm lives, the pooled event-time spine, the risk-set
    * cumulatives, both per-time grid terms, and the final z. */
  val q296 = GQuery("q296_log_rank",
    """WITH ph AS (
      |  SELECT user_id, CAST(floor(epoch(ts) / 3600) AS BIGINT) AS h,
      |    event_id,
      |    CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 12))
      |      AS BIGINT) % 2 AS grp
      |  FROM events WHERE event_type = 'purchase'),
      |eh AS (
      |  SELECT CAST(max(floor(epoch(ts) / 3600)) AS BIGINT) AS e
      |  FROM events),
      |lv AS (
      |  SELECT grp,
      |    COALESCE(lead(h) OVER w - h, e - h) AS t,
      |    CASE WHEN lead(h) OVER w IS NOT NULL THEN 1 ELSE 0 END AS ev
      |  FROM ph CROSS JOIN eh
      |  WINDOW w AS (PARTITION BY user_id ORDER BY h, event_id)),
      |cells AS (
      |  SELECT t,
      |    CAST(sum(CASE WHEN grp = 0 THEN 1 ELSE 0 END) AS BIGINT) AS m1,
      |    CAST(sum(CASE WHEN grp = 1 THEN 1 ELSE 0 END) AS BIGINT) AS m2,
      |    CAST(sum(CASE WHEN grp = 0 THEN ev ELSE 0 END) AS BIGINT)
      |      AS d1,
      |    CAST(sum(CASE WHEN grp = 1 THEN ev ELSE 0 END) AS BIGINT)
      |      AS d2
      |  FROM lv GROUP BY t),
      |sp AS (
      |  SELECT t, m1, m2, d1, d2,
      |    COALESCE(CAST(sum(m1) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS b1,
      |    COALESCE(CAST(sum(m2) OVER (ORDER BY t
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT),
      |      0) AS b2
      |  FROM cells),
      |tot AS (
      |  SELECT CAST(sum(m1) AS BIGINT) AS na,
      |    CAST(sum(m2) AS BIGINT) AS nb
      |  FROM cells),
      |pt AS (
      |  SELECT na, nb,
      |    CAST(round(1e6 * (d1 - CAST(d1 + d2 AS DOUBLE) * (na - b1)
      |      / ((na - b1) + (nb - b2)))) AS BIGINT) AS ome6,
      |    CAST(round(1e6 * CAST(d1 + d2 AS DOUBLE)
      |      * (CAST(na - b1 AS DOUBLE) / ((na - b1) + (nb - b2)))
      |      * (CAST(nb - b2 AS DOUBLE) / ((na - b1) + (nb - b2)))
      |      * ((na - b1) + (nb - b2) - (d1 + d2))
      |      / ((na - b1) + (nb - b2) - 1)) AS BIGINT) AS v6
      |  FROM sp CROSS JOIN tot
      |  WHERE d1 + d2 > 0 AND (na - b1) + (nb - b2) > 1)
      |SELECT na AS n_a, nb AS n_b,
      |  CAST(count(*) AS BIGINT) AS n_event_times,
      |  CAST(sum(ome6) AS BIGINT) AS o_minus_e6,
      |  CAST(sum(v6) AS BIGINT) AS var6,
      |  CASE WHEN sum(v6) > 0
      |    THEN CAST(round(1e4 * (CAST(sum(ome6) AS DOUBLE) / 1e6)
      |      / sqrt(CAST(sum(v6) AS DOUBLE) / 1e6)) AS BIGINT)
      |    ELSE 0 END AS z4
      |FROM pt GROUP BY 1, 2""".stripMargin) { (s, dir) =>
    val ev = Tables.events(s, dir)
    val ph = ev.where(col("event_type") === "purchase")
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 3600L).as("h"), col("event_id"))
      .withColumn("grp",
        pmod(conv(substring(md5(col("user_id").cast("string")), 1, 12),
          16, 10).cast("long"), lit(2L)).cast("string"))
    val endH = ev
      .agg(max(floor(unix_timestamp(col("ts")) / 3600L)).as("eh"))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("h"), col("event_id"))
    val lives = ph.withColumn("nh", lead(col("h"), 1).over(w))
      .crossJoin(broadcast(endH))
      .select(col("grp"),
        when(col("nh").isNotNull, col("nh") - col("h"))
          .otherwise(col("eh") - col("h")).as("t"),
        col("nh").isNotNull.cast("long").as("ev"))
    graft.operators.EventOps.logRank(lives, "t", "ev", "grp", "0", "1")
  }

  /** Per-user busy-time coverage (see
    * [[graft.operators.EventOps.intervalCoverage]]): each event
    * occupies [ts, ts + ⌊value⌋] seconds; overlapping or touching
    * intervals merge into islands and the report gives true covered
    * seconds vs naive span — the union-of-intervals question a plain
    * SUM double-counts. The oracle replays the running-max island
    * flags, the cumulative island ids, and both aggregates. */
  val q277 = GQuery("q277_interval_coverage",
    """WITH iv AS (
      |  SELECT user_id, CAST(floor(epoch(ts)) AS BIGINT) AS st,
      |    CAST(floor(epoch(ts)) AS BIGINT)
      |      + CAST(floor("value") AS BIGINT) AS en
      |  FROM events),
      |g AS (
      |  SELECT user_id, st, en,
      |    max(en) OVER (PARTITION BY user_id ORDER BY st, en
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM iv),
      |si AS (
      |  SELECT user_id, st, en,
      |    sum(CASE WHEN prev_max IS NULL OR st > prev_max THEN 1 ELSE 0
      |      END) OVER (PARTITION BY user_id ORDER BY st, en
      |      ROWS UNBOUNDED PRECEDING) AS island
      |  FROM g),
      |isl AS (
      |  SELECT user_id, island, count(*) AS n_iv,
      |    min(st) AS ist, max(en) AS ien
      |  FROM si GROUP BY 1, 2)
      |SELECT user_id, CAST(sum(n_iv) AS BIGINT) AS n_intervals,
      |  CAST(count(*) AS BIGINT) AS n_islands,
      |  CAST(sum(ien - ist + 1) AS BIGINT) AS covered,
      |  CAST(max(ien) - min(ist) + 1 AS BIGINT) AS span
      |FROM isl GROUP BY 1 ORDER BY user_id""".stripMargin) { (s, dir) =>
    val iv = Tables.events(s, dir)
      .withColumn("st", unix_timestamp(col("ts")))
      .withColumn("en", col("st") + floor(col("value")).cast("long"))
    graft.operators.EventOps.intervalCoverage(iv, "user_id", "st", "en")
      .orderBy(col("user_id"))
  }

  /** Maximum drawdown of daily revenue (see
    * [[graft.operators.EventOps.maxDrawdown]]): the largest drop of
    * the daily o_totalprice cents total from its running peak, with
    * the date it bottomed and the peak it fell from — the worst-
    * decline risk readout, exact on the cents grid. */
  val q305 = GQuery("q305_max_drawdown",
    """WITH daily AS (
      |  SELECT o_orderdate AS d,
      |    CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1),
      |p AS (SELECT d, rev_c,
      |  max(rev_c) OVER (ORDER BY d ROWS UNBOUNDED PRECEDING) AS peak
      |  FROM daily),
      |x AS (SELECT peak - rev_c AS dd, d, peak FROM p
      |  ORDER BY dd DESC, d LIMIT 1)
      |SELECT CAST(dd AS BIGINT) AS max_dd, d AS dd_date,
      |  CAST(peak AS BIGINT) AS peak_before
      |FROM x""".stripMargin) { (s, dir) =>
    val daily = Tables.orders(s, dir)
      .groupBy(col("o_orderdate").as("d"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
    graft.operators.EventOps.maxDrawdown(daily, "d", "rev_c")
      .withColumnRenamed("dd_ord", "dd_date")
  }

  /** Frequent behavior trigrams (see
    * [[graft.operators.EventOps.eventKgrams]]): every 3-action window
    * of each user's ordered event-initial string, with occurrence and
    * distinct-user support — the contiguous core of frequent-sequence
    * mining, on the q301 sequence spine. */
  val q306 = GQuery("q306_event_trigrams",
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(substr(event_type, 1, 1), '' ORDER BY ts, event_id)
      |      AS seq
      |  FROM events GROUP BY user_id),
      |g AS (
      |  SELECT user_id, substr(seq, CAST(i AS INTEGER), 3) AS gram
      |  FROM s, unnest(generate_series(1, length(seq) - 2)) AS t(i)
      |  WHERE length(seq) >= 3)
      |SELECT gram, CAST(count(*) AS BIGINT) AS n_occurrences,
      |  CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
      |FROM g GROUP BY 1 HAVING count(*) >= 5
      |ORDER BY gram""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.eventKgrams(Tables.events(s, dir),
        "user_id", "ts", "event_id", "event_type", 3)
      .where(col("n_occurrences") >= 5)
      .orderBy(col("gram"))
  }

  /** Throttle-style tolerance dedup (see
    * [[graft.operators.EventOps.throttleDedup]]): per (user, type),
    * keep the first event and every event ≥ 5 minutes after the last
    * KEPT one — the debounce contract where each decision depends on
    * the previous DECISION. The Spark side folds the per-key
    * recurrence in one codegen'd higher-order aggregate; the oracle
    * replays it as a rank-indexed RECURSIVE walk, so a hash match
    * proves fold ≡ sequential scan. */
  val q307 = GQuery("q307_throttle_dedup",
    """WITH RECURSIVE e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS us,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events),
      |n AS (SELECT user_id, event_type,
      |  CAST(count(*) AS BIGINT) AS n_events FROM e GROUP BY 1, 2),
      |walk(user_id, event_type, rn, last_us, n_kept) AS (
      |  SELECT user_id, event_type, rn, us, CAST(1 AS BIGINT)
      |  FROM e WHERE rn = 1
      |  UNION ALL
      |  SELECT e.user_id, e.event_type, e.rn,
      |    CASE WHEN e.us >= w.last_us + 300000000 THEN e.us
      |      ELSE w.last_us END,
      |    CASE WHEN e.us >= w.last_us + 300000000 THEN w.n_kept + 1
      |      ELSE w.n_kept END
      |  FROM walk w JOIN e ON e.user_id = w.user_id
      |    AND e.event_type = w.event_type AND e.rn = w.rn + 1),
      |f AS (
      |  SELECT user_id, event_type, n_kept,
      |    CAST(last_us AS BIGINT) AS last_kept_us,
      |    row_number() OVER (PARTITION BY user_id, event_type
      |      ORDER BY rn DESC) AS rr
      |  FROM walk)
      |SELECT n.user_id, n.event_type, n.n_events, f.n_kept,
      |  f.last_kept_us
      |FROM n JOIN f ON f.user_id = n.user_id
      |  AND f.event_type = n.event_type AND f.rr = 1
      |ORDER BY n.user_id, n.event_type""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.throttleDedup(Tables.events(s, dir),
        Seq("user_id", "event_type"), "ts", "event_id", 300000000L)
      .orderBy(col("user_id"), col("event_type"))
  }

  /** Deadline conversion (see
    * [[graft.operators.EventOps.windowedConversion]]): per user, how
    * many views were followed by a purchase within one hour —
    * attribution with a deadline, stricter than the ordered funnel.
    * The oracle is the textbook correlated EXISTS. */
  val q309 = GQuery("q309_windowed_conversion",
    """WITH a AS (SELECT user_id AS u, epoch_us(ts) AS ta
      |  FROM events WHERE event_type = 'view'),
      |b AS (SELECT user_id AS u, epoch_us(ts) AS tb
      |  FROM events WHERE event_type = 'purchase'),
      |c AS (SELECT u FROM a WHERE EXISTS (
      |  SELECT 1 FROM b WHERE b.u = a.u AND b.tb > a.ta
      |    AND b.tb <= a.ta + 3600000000)),
      |na AS (SELECT u, CAST(count(*) AS BIGINT) AS n_a FROM a GROUP BY 1),
      |nc AS (SELECT u, CAST(count(*) AS BIGINT) AS n_converted
      |  FROM c GROUP BY 1)
      |SELECT na.u AS user, na.n_a,
      |  CAST(coalesce(nc.n_converted, 0) AS BIGINT) AS n_converted
      |FROM na LEFT JOIN nc USING (u)
      |ORDER BY na.u""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.windowedConversion(Tables.events(s, dir),
        "user_id", "ts", "event_type", "view", "purchase", 3600000000L)
      .orderBy(col("user"))
  }

  /** Seasonal-naive anomaly census (see
    * [[graft.operators.EventOps.seasonalMadAnomalies]]): daily volume
    * per type vs same-weekday-last-week, flagged beyond 3× the exact
    * integer MAD — the seasonality-aware complement of the q300
    * Hampel window (which would flag every weekend of a weekly-shaped
    * series). */
  val q313 = GQuery("q313_seasonal_mad",
    """WITH dd AS (
      |  SELECT event_type AS grp,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |sp AS (SELECT CAST(min(d) AS BIGINT) AS d0,
      |  CAST(max(d) AS BIGINT) AS d1 FROM dd),
      |gs AS (SELECT DISTINCT grp FROM dd),
      |spine AS (SELECT grp, unnest(generate_series(d0, d1)) AS d
      |  FROM gs CROSS JOIN sp),
      |ser AS (
      |  SELECT spine.grp, spine.d, COALESCE(c.y, 0) AS y
      |  FROM spine LEFT JOIN (
      |    SELECT grp, d, CAST(count(*) AS BIGINT) AS y
      |    FROM dd GROUP BY 1, 2) c
      |    ON c.grp = spine.grp AND c.d = spine.d),
      |res AS (SELECT grp, d, abs(y - yl) AS a FROM (
      |  SELECT grp, d, y,
      |    lag(y, 7) OVER (PARTITION BY grp ORDER BY d) AS yl FROM ser)
      |  WHERE yl IS NOT NULL),
      |r2 AS (SELECT grp, a,
      |  row_number() OVER (PARTITION BY grp ORDER BY a) AS rn FROM res),
      |n AS (SELECT grp, CAST(count(*) AS BIGINT) AS n_res
      |  FROM res GROUP BY 1),
      |mad AS (
      |  SELECT r2.grp, CAST(sum(r2.a) *
      |    (CASE WHEN max(n.n_res) % 2 = 1 THEN 2 ELSE 1 END) AS BIGINT)
      |    AS mad2
      |  FROM r2 JOIN n USING (grp)
      |  WHERE (n_res % 2 = 1 AND rn = (n_res + 1) // 2)
      |     OR (n_res % 2 = 0 AND (rn = n_res // 2 OR rn = n_res // 2 + 1))
      |  GROUP BY 1),
      |wst AS (SELECT grp, CAST(max(a) AS BIGINT) AS worst_dev
      |  FROM res GROUP BY 1),
      |wd AS (SELECT res.grp, CAST(min(res.d) AS BIGINT) AS worst_day
      |  FROM res JOIN wst ON wst.grp = res.grp AND res.a = wst.worst_dev
      |  GROUP BY 1)
      |SELECT n.grp, n.n_res, mad.mad2,
      |  CAST(sum(CASE WHEN 2 * res.a > 3 * mad.mad2 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_anomalies,
      |  wst.worst_dev, wd.worst_day
      |FROM res JOIN n USING (grp) JOIN mad USING (grp)
      |  JOIN wst USING (grp) JOIN wd USING (grp)
      |GROUP BY n.grp, n.n_res, mad.mad2, wst.worst_dev, wd.worst_day
      |ORDER BY n.grp""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.seasonalMadAnomalies(Tables.events(s, dir),
        "event_type", "ts", period = 7)
      .orderBy(col("grp"))
  }

  /** Holt–Winters additive seasonal forecast (see
    * [[graft.operators.EventOps.holtWintersForecast]], period 7): the
    * level+trend+SEASON completion of q299, every recurrence on the
    * exact 1e-4 grid. The oracle walks the same recursion with the
    * rotating 7-seasonal queue carried as columns — floor division
    * emulated against DuckDB's truncating `//` exactly as in q299. */
  val q315 = {
    // exact FLOOR division by 10 on possibly-negative numerators
    def fd(num: String) =
      s"((($num) - ((($num) % 10) + 10) % 10) // 10)"
    val sCols = (1 to 7).map(i => s"s$i").mkString(", ")
    GQuery("q315_holt_winters",
    s"""WITH RECURSIVE dd AS (
      |  SELECT event_type AS grp,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |sp AS (SELECT CAST(min(d) AS BIGINT) AS d0,
      |  CAST(max(d) AS BIGINT) AS d1 FROM dd),
      |gs AS (SELECT DISTINCT grp FROM dd),
      |spine AS (SELECT grp, unnest(generate_series(d0, d1)) AS d
      |  FROM gs CROSS JOIN sp),
      |ser AS (
      |  SELECT spine.grp, spine.d, COALESCE(c.y, 0) AS y,
      |    CAST(row_number() OVER (PARTITION BY spine.grp
      |      ORDER BY spine.d) - 1 AS BIGINT) AS i
      |  FROM spine LEFT JOIN (
      |    SELECT grp, d, CAST(count(*) AS BIGINT) AS y
      |    FROM dd GROUP BY 1, 2) c
      |    ON c.grp = spine.grp AND c.d = spine.d),
      |mx AS (SELECT grp, CAST(max(i) AS BIGINT) AS t FROM ser GROUP BY 1),
      |init AS (
      |  SELECT q.grp, (2 * q.S + 7) // 14 AS l0
      |  FROM (SELECT grp, sum(y * 10000) AS S FROM ser WHERE i < 7
      |    GROUP BY 1) q
      |  JOIN mx ON mx.grp = q.grp AND mx.t >= 7),
      |s0 AS (
      |  SELECT ser.grp,
      |    ${(0 to 6).map(i =>
            s"max(CASE WHEN ser.i = $i THEN ser.y * 10000 - init.l0 END) AS s${i + 1}")
            .mkString(",\n      |    ")}
      |  FROM ser JOIN init USING (grp) WHERE ser.i < 7 GROUP BY 1),
      |walk(grp, i, l, b, $sCols) AS (
      |  SELECT init.grp, CAST(6 AS BIGINT), CAST(init.l0 AS HUGEINT),
      |    CAST(0 AS HUGEINT),
      |    ${(1 to 7).map(i => s"CAST(s0.s$i AS HUGEINT)").mkString(", ")}
      |  FROM init JOIN s0 USING (grp)
      |  UNION ALL
      |  SELECT grp, i, l2,
      |    CAST(${fd("2 * (l2 - l_old) + 8 * b_old + 5")} AS HUGEINT),
      |    s2, s3, s4, s5, s6, s7,
      |    CAST(${fd("3 * (yv - l2) + 7 * s1_old + 5")} AS HUGEINT)
      |  FROM (
      |    SELECT w.grp, w.i + 1 AS i, w.l AS l_old, w.b AS b_old,
      |      w.s1 AS s1_old, w.s2, w.s3, w.s4, w.s5, w.s6, w.s7,
      |      y.y * 10000 AS yv,
      |      CAST(${fd("3 * (y.y * 10000 - w.s1) + 7 * (w.l + w.b) + 5")}
      |        AS HUGEINT) AS l2
      |    FROM walk w JOIN ser y ON y.grp = w.grp AND y.i = w.i + 1) q),
      |fin AS (SELECT w.* FROM walk w
      |  JOIN mx ON mx.grp = w.grp AND w.i = mx.t),
      |hh AS (SELECT unnest(generate_series(1, 7)) AS h)
      |SELECT fin.grp, CAST(hh.h AS BIGINT) AS h,
      |  CAST(fin.l AS BIGINT) AS level4, CAST(fin.b AS BIGINT) AS trend4,
      |  CAST(CASE hh.h ${(1 to 7).map(i => s"WHEN $i THEN fin.s$i")
            .mkString(" ")} END AS BIGINT) AS season4,
      |  CAST(fin.l + hh.h * fin.b + CASE hh.h ${(1 to 7)
            .map(i => s"WHEN $i THEN fin.s$i").mkString(" ")} END
      |    AS BIGINT) AS forecast4
      |FROM fin CROSS JOIN hh
      |ORDER BY fin.grp, hh.h""".stripMargin) { (s, dir) =>
      graft.operators.EventOps.holtWintersForecast(Tables.events(s, dir),
          "ts", "event_type", period = 7)
        .orderBy(col("grp"), col("h"))
    }
  }

  /** Rolling 7-day active users (see
    * [[graft.operators.EventOps.rollingDistinctUsers]]): the exact
    * moving COUNT(DISTINCT) no window clause can express, via
    * coverage explosion on the day grain. */
  val q316 = GQuery("q316_rolling_active_users",
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |sp AS (SELECT CAST(max(d) AS BIGINT) AS d1 FROM act),
      |cover AS (
      |  SELECT DISTINCT user_id, d + i AS w
      |  FROM act, unnest(generate_series(0, 6)) AS t(i))
      |SELECT w AS day, CAST(count(*) AS BIGINT) AS n_users
      |FROM cover CROSS JOIN sp WHERE w <= d1
      |GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    graft.operators.EventOps.rollingDistinctUsers(Tables.events(s, dir),
        "user_id", "ts", windowDays = 7)
      .orderBy(col("day"))
  }

  /** Dormancy / resurrection census: per-user activity-day gaps — a
    * gap > 14 days is a resurrection (user went dormant and came
    * back), a last-activity day more than 14 before the corpus
    * horizon is dormancy-at-end. One distinct day grain, one lag
    * window, pure integer day arithmetic — the lifecycle readout
    * (churned vs resurrected vs active) every retention dashboard
    * opens with. One row: (n_users, n_resurrected_users,
    * n_resurrections, n_dormant_at_end). */
  val q324 = GQuery("q324_dormancy_census",
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    CAST(floor(epoch(ts) / 86400) AS BIGINT) AS d
      |  FROM events),
      |mx AS (SELECT CAST(max(d) AS BIGINT) AS dmax FROM act),
      |g AS (
      |  SELECT user_id, d,
      |    d - lag(d) OVER (PARTITION BY user_id ORDER BY d) AS gap
      |  FROM act),
      |u AS (
      |  SELECT user_id,
      |    CAST(sum(CASE WHEN gap > 14 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_res,
      |    CAST(max(d) AS BIGINT) AS last_d
      |  FROM g GROUP BY 1)
      |SELECT CAST(count(*) AS BIGINT) AS n_users,
      |  CAST(sum(CASE WHEN n_res >= 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_resurrected_users,
      |  CAST(sum(n_res) AS BIGINT) AS n_resurrections,
      |  CAST(sum(CASE WHEN last_d < dmax - 14 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_dormant_at_end
      |FROM u CROSS JOIN mx""".stripMargin) { (s, dir) =>
    val act = Tables.events(s, dir)
      .select(col("user_id"),
        floor(unix_timestamp(col("ts")) / 86400L).as("d"))
      .distinct()
    val mx = act.agg(max(col("d")).as("dmax"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("d"))
    act.withColumn("gap", col("d") - lag(col("d"), 1).over(w))
      .groupBy(col("user_id"))
      .agg(sum(when(col("gap") > 14, 1L).otherwise(0L)).as("n_res"),
        max(col("d")).as("last_d"))
      .crossJoin(broadcast(mx))
      .agg(count(lit(1)).as("n_users"),
        sum(when(col("n_res") >= 1, 1L).otherwise(0L))
          .as("n_resurrected_users"),
        sum(col("n_res")).as("n_resurrections"),
        sum(when(col("last_d") < col("dmax") - 14, 1L).otherwise(0L))
          .as("n_dormant_at_end"))
  }

  /** Spend-decile mobility matrix: customers ranked into deciles by
    * order-cents in the FIRST half of the date span vs the SECOND
    * half (customers active in both), cross-tabulated — the cohort
    * movement readout behind "are our best buyers stable?". Decile
    * assignment is ntile(10) over the total order (cents DESC,
    * custkey), identical floor-based bucket semantics in both
    * engines. */
  val q325 = GQuery("q325_decile_mobility",
    """WITH sp AS (
      |  SELECT CAST(min(epoch(o_orderdate)) AS BIGINT) AS t0,
      |    CAST(max(epoch(o_orderdate)) AS BIGINT) AS t1
      |  FROM orders),
      |h AS (
      |  SELECT o_custkey AS c,
      |    CASE WHEN epoch(o_orderdate) * 2 <= t0 + t1 THEN 1 ELSE 2 END
      |      AS half,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders CROSS JOIN sp),
      |s AS (SELECT c, half, CAST(sum(cents) AS BIGINT) AS tot
      |  FROM h GROUP BY 1, 2),
      |bot AS (
      |  SELECT c, half,
      |    ntile(10) OVER (PARTITION BY half ORDER BY tot DESC, c)
      |      AS dec
      |  FROM s),
      |m AS (
      |  SELECT a.dec AS dec_a, b.dec AS dec_b
      |  FROM bot a JOIN bot b ON a.c = b.c AND a.half = 1 AND b.half = 2)
      |SELECT CAST(dec_a AS BIGINT) AS dec_a, CAST(dec_b AS BIGINT)
      |  AS dec_b, CAST(count(*) AS BIGINT) AS n_customers
      |FROM m GROUP BY 1, 2
      |ORDER BY dec_a, dec_b""".stripMargin) { (s, dir) =>
    val o = Tables.orders(s, dir)
      .select(col("o_custkey").as("c"),
        unix_timestamp(col("o_orderdate")).as("t"),
        round(col("o_totalprice") * 100).cast("long").as("cents"))
    val sp = o.agg(min(col("t")).as("t0"), max(col("t")).as("t1"))
    val sums = o.crossJoin(broadcast(sp))
      .withColumn("half",
        when(col("t") * 2 <= col("t0") + col("t1"), 1).otherwise(2))
      .groupBy(col("c"), col("half"))
      .agg(sum(col("cents")).as("tot"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("half")).orderBy(col("tot").desc, col("c"))
    val dec = sums.withColumn("dec", ntile(10).over(w))
    dec.where(col("half") === 1)
      .select(col("c"), col("dec").as("dec_a"))
      .join(dec.where(col("half") === 2)
        .select(col("c"), col("dec").as("dec_b")), Seq("c"))
      .groupBy(col("dec_a").cast("long").as("dec_a"),
        col("dec_b").cast("long").as("dec_b"))
      .agg(count(lit(1)).as("n_customers"))
      .orderBy(col("dec_a"), col("dec_b"))
  }

  val all: Seq[GQuery] =
    Seq(q13, q14, q15, q16, q17, q21, q156, q157, q166, q168, q172, q173,
      q174, q178, q181, q185, q187, q188, q193, q197, q198, q200, q201,
      q203, q205, q213, q214, q218, q222, q223, q226, q227, q229, q234,
      q235, q240, q244, q247, q264, q277, q280, q282, q288, q293, q294,
      q296, q298, q299, q300, q301, q302, q305, q306, q307, q309, q313,
      q315, q316, q324, q325)
}
