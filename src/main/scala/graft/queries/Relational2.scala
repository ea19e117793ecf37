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

  /** Three deterministic customer-dimension snapshots (yearly stamps;
    * segment mutates for key%3 at v2 and key%5 at v3, tier flips to
    * gold for key%7 at v3) — the fixture both SCD2 queries share. */
  private def custSnaps(s: org.apache.spark.sql.SparkSession, dir: String) = {
    val c = Tables.customer(s, dir)
      .select(col("c_custkey").cast("long").as("k"),
        col("c_mktsegment").as("seg0"))
    def snap(ts: String, seg: org.apache.spark.sql.Column,
             tier: org.apache.spark.sql.Column) =
      c.select(col("k"), to_timestamp(lit(ts)).as("snap_ts"),
        seg.as("seg"), tier.as("tier"))
    val segV2 = when(col("k") % 3 === 0, concat(col("seg0"), lit("_V2")))
      .otherwise(col("seg0"))
    val segV3 = when(col("k") % 5 === 0, concat(col("seg0"), lit("_V3")))
      .otherwise(segV2)
    snap("1993-01-01", col("seg0"), lit("std"))
      .unionAll(snap("1995-01-01", segV2, lit("std")))
      .unionAll(snap("1997-01-01", segV3,
        when(col("k") % 7 === 0, lit("gold")).otherwise(lit("std"))))
  }

  private val snapsCte =
    """snaps AS (
      |  SELECT c_custkey AS k, TIMESTAMP '1993-01-01' AS snap_ts,
      |    c_mktsegment AS seg, 'std' AS tier FROM customer
      |  UNION ALL
      |  SELECT c_custkey, TIMESTAMP '1995-01-01',
      |    CASE WHEN c_custkey % 3 = 0 THEN c_mktsegment || '_V2'
      |         ELSE c_mktsegment END, 'std' FROM customer
      |  UNION ALL
      |  SELECT c_custkey, TIMESTAMP '1997-01-01',
      |    CASE WHEN c_custkey % 5 = 0 THEN c_mktsegment || '_V3'
      |         WHEN c_custkey % 3 = 0 THEN c_mktsegment || '_V2'
      |         ELSE c_mktsegment END,
      |    CASE WHEN c_custkey % 7 = 0 THEN 'gold' ELSE 'std' END
      |  FROM customer)""".stripMargin

  private val scd2Cte =
    s"""$snapsCte,
       |chg AS (
       |  SELECT *, CASE WHEN seg IS DISTINCT FROM lag(seg) OVER w
       |                   OR tier IS DISTINCT FROM lag(tier) OVER w
       |            THEN 1 ELSE 0 END AS chg
       |  FROM snaps WINDOW w AS (PARTITION BY k ORDER BY snap_ts)),
       |isl AS (
       |  SELECT *, sum(chg) OVER (PARTITION BY k ORDER BY snap_ts
       |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS isl
       |  FROM chg),
       |scd2 AS (
       |  SELECT k, seg, tier, valid_from,
       |    lead(valid_from) OVER (PARTITION BY k ORDER BY valid_from)
       |      AS valid_to
       |  FROM (SELECT k, seg, tier, min(snap_ts) AS valid_from
       |        FROM isl GROUP BY k, isl, seg, tier))""".stripMargin

  /** SCD2 history build (see [[graft.operators.Scd.scd2Build]]):
    * three customer snapshots compress into per-key validity
    * intervals — unchanged attributes merge across snapshots, each
    * change opens an interval, the latest interval stays open
    * (null valid_to). The oracle replays the lag/island/lead
    * compression in SQL. */
  val q209 = GQuery("q209_scd2_build",
    s"""WITH $scd2Cte
       |SELECT k, seg, tier, valid_from, valid_to
       |FROM scd2 ORDER BY k, valid_from""".stripMargin) { (s, dir) =>
    graft.operators.Scd.scd2Build(custSnaps(s, dir), "k", "snap_ts",
        Seq("seg", "tier"))
      .select(col("k"), col("seg"), col("tier"),
        col("valid_from"), col("valid_to"))
      .orderBy(col("k"), col("valid_from"))
  }

  /** Point-in-time fact lookup over the q209 SCD2 dimension (see
    * [[graft.operators.Scd.pointInTimeJoin]]): every order gets the
    * segment/tier valid AT its order date (orders predating the first
    * snapshot fall in the '(none)' bucket), then revenue rolls up by
    * the point-in-time attributes — the leak-proof dimensional
    * aggregation. Oracle: DuckDB ASOF LEFT JOIN on valid_from. */
  val q210 = GQuery("q210_scd2_pit_lookup",
    s"""WITH $scd2Cte
       |SELECT coalesce(d.seg, '(none)') AS seg,
       |  coalesce(d.tier, '(none)') AS tier,
       |  count(*) AS n_orders,
       |  round(sum(o.o_totalprice), 2) AS sum_price
       |FROM orders o ASOF LEFT JOIN scd2 d
       |  ON o.o_custkey = d.k AND o.o_orderdate >= d.valid_from
       |GROUP BY 1, 2 ORDER BY seg, tier""".stripMargin) { (s, dir) =>
    val dim = graft.operators.Scd.scd2Build(custSnaps(s, dir), "k",
      "snap_ts", Seq("seg", "tier"))
    graft.operators.Scd.pointInTimeJoin(
        Tables.orders(s, dir).select(col("o_custkey").cast("long").as("ck"),
          col("o_orderdate"), col("o_totalprice")),
        dim, factKey = "ck", dimKey = "k", factTs = "o_orderdate",
        attrCols = Seq("seg", "tier"))
      .groupBy(coalesce(col("seg"), lit("(none)")).as("seg"),
        coalesce(col("tier"), lit("(none)")).as("tier"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("seg"), col("tier"))
  }

  /** Stream-stream temporal enrichment (VERDICT r8 #8's second named
    * gap — [[graft.streaming.Pipelines.PitEnricher]]): the q209
    * dimension snapshots stream into an scd2 change store one snapshot
    * date per micro-batch, and orders stream in THREE time-aligned
    * fact batches, each enriched as-of its own order dates against the
    * dimension AS KNOWN AT THAT POINT of the stream — the union of the
    * per-batch enrichments must equal the batch point-in-time join
    * over the full histories (q210's ASOF oracle shape, rolled up by
    * order year so the temporal seams are visible). */
  val q329 = GQuery("q329_streaming_pit_enrich",
    s"""WITH $scd2Cte
       |SELECT CAST(year(o.o_orderdate) AS BIGINT) AS yr,
       |  coalesce(d.seg, '(none)') AS seg,
       |  coalesce(d.tier, '(none)') AS tier,
       |  count(*) AS n_orders,
       |  round(sum(o.o_totalprice), 2) AS sum_price
       |FROM orders o ASOF LEFT JOIN scd2 d
       |  ON o.o_custkey = d.k AND o.o_orderdate >= d.valid_from
       |GROUP BY 1, 2, 3
       |ORDER BY yr, seg, tier""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val store = java.nio.file.Files
      .createTempDirectory("q329_pitstore").toString
    val enr = Pipelines.PitEnricher(store, Seq("seg", "tier"), buckets = 16)
    val snaps = custSnaps(s, dir)
    val facts = Tables.orders(s, dir).select(
      col("o_custkey").cast("long").as("ck"),
      col("o_orderdate"), col("o_totalprice"))
    val cuts = Seq("1993-01-01", "1995-01-01", "1997-01-01")
    val enriched = cuts.zipWithIndex.map { case (d0, i) =>
      enr.ingestDim(
        snaps.where(col("snap_ts") === to_timestamp(lit(d0))), i.toLong)
      // time-aligned fact slice: everything before the NEXT dim
      // snapshot (batch 0 also carries the pre-history orders that
      // predate the first snapshot → '(none)')
      val f =
        if (i == 0) facts.where(col("o_orderdate") < lit(cuts(1)))
        else if (i + 1 < cuts.length)
          facts.where(col("o_orderdate") >= lit(d0) &&
            col("o_orderdate") < lit(cuts(i + 1)))
        else facts.where(col("o_orderdate") >= lit(d0))
      // materialize NOW: each batch must be enriched against the store
      // as of THIS point in the stream, not the final store state
      enr.enrich(f, "ck", "o_orderdate").localCheckpoint(true)
    }.reduce(_ unionByName _)
    enriched
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        coalesce(col("seg"), lit("(none)")).as("seg"),
        coalesce(col("tier"), lit("(none)")).as("tier"))
      .agg(count(lit(1)).as("n_orders"),
        round(sum(col("o_totalprice")), 2).as("sum_price"))
      .orderBy(col("yr"), col("seg"), col("tier"))
  }

  /** Fact×fact stream-stream interval join (VERDICT r9 #8's second
    * named shape — [[graft.streaming.Pipelines.intervalJoinStreams]]):
    * view events and click events arrive as two UNBOUNDED watermarked
    * streams (the fixture file through the real file-stream source,
    * so the executed plan is the streaming symmetric-hash join, not a
    * batch range join), and every click within 2 hours of a same-user
    * view is attributed to it. Unlike q329's fact×dim as-of
    * enrichment, BOTH sides here are facts with their own event time
    * and their own watermark — the join state is (delay + interval)
    * deep per user, never history-deep. Oracle: the equivalent batch
    * interval self-join. */
  /** The events fixture through the REAL file-stream source, plus the
    * ts normalization both read paths share (exactly what
    * [[graft.Tables.events]] does batch-side — the nanos-generation
    * fixture reads ts as a raw long). The source needs a
    * directory-rooted glob, not a bare file path ("Option 'basePath'
    * must be a directory"). Shared by q331/q333/q334. */
  private def eventsStreamed(
      s: org.apache.spark.sql.SparkSession, dir: String)
      : (org.apache.spark.sql.DataFrame, org.apache.spark.sql.DataFrame) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val path = Tables.path(dir, "events")
    // session-memoized footer read (Tables.load) — a bare
    // read.parquet(path).schema here paid a schema-inference job per
    // streaming query construction
    val rawSchema = Tables.load(s, dir, "events").schema
    def norm(df: org.apache.spark.sql.DataFrame) =
      rawSchema("ts").dataType match {
        case org.apache.spark.sql.types.LongType =>
          df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
        case _ => df.withColumn("ts",
          col("ts").cast(org.apache.spark.sql.types.TimestampType))
      }
    (norm(s.readStream.schema(rawSchema)
        .option("basePath", dir).parquet(s"$dir/events*.parquet")),
      Tables.events(s, dir))
  }

  val q331 = GQuery("q331_stream_stream_interval_join",
    """SELECT v.user_id, v.event_id AS view_id, c.event_id AS click_id,
      |  CAST(date_diff('second', v.ts, c.ts) AS BIGINT) AS lag_s
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
      |ORDER BY v.user_id, view_id, click_id""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val (ev, _) = eventsStreamed(s, dir)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    Pipelines.runToMemory(
      Pipelines.intervalJoinStreams(views, clicks,
          "user_id", "uid_c", "view_ts", "click_ts",
          delay = "1 hour", within = "2 hours")
        .select(col("user_id"), col("view_id"), col("click_id"),
          (unix_timestamp(col("click_ts")) - unix_timestamp(col("view_ts")))
            .as("lag_s")))
      .orderBy(col("user_id"), col("view_id"), col("click_id"))
  }

  /** View ABANDONMENT via the left-outer stream-stream interval join
    * (the state-timeout-emission face of q331): a view with no
    * same-user click inside its 2-hour window emits exactly one
    * null-padded row once the watermark proves no click can still
    * land — the streaming "never converted" report. Both sides
    * restrict to views older than the flush horizon — computed from
    * each stream's own max event time, because the watermark is the
    * MIN across sources of (max seen − delay): horizon =
    * min(max view ts, max click ts) − delay − interval − a 10-minute
    * margin. The restriction is applied to the OUTPUT, never to the
    * view stream itself: pre-filtering the views would lower their
    * side's watermark by the very margin being enforced and
    * recursively strand the last window's unmatched views in state
    * (measured: 7 views silently unadjudicated at sf0.01). */
  val q333 = GQuery("q333_stream_view_abandonment",
    """WITH h AS (
      |  SELECT least(
      |      max(ts) FILTER (WHERE event_type = 'view'),
      |      max(ts) FILTER (WHERE event_type = 'click'))
      |    - INTERVAL 3 HOUR - INTERVAL 10 MINUTE AS cut
      |  FROM events),
      |j AS (
      |  SELECT v.event_id AS view_id, v.user_id,
      |    count(c.event_id) AS n_clicks
      |  FROM events v
      |  LEFT JOIN events c
      |    ON v.user_id = c.user_id AND c.event_type = 'click'
      |   AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
      |  WHERE v.event_type = 'view' AND v.ts < (SELECT cut FROM h)
      |  GROUP BY 1, 2)
      |SELECT user_id, CAST(count(*) AS BIGINT) AS n_abandoned
      |FROM j WHERE n_clicks = 0
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val (ev, evBatch) = eventsStreamed(s, dir)
    // flush horizon, computed batch-side (deterministic)
    val cut = evBatch
      .agg(least(
        max(when(col("event_type") === "view", col("ts"))),
        max(when(col("event_type") === "click", col("ts")))))
      .head().getTimestamp(0).toInstant.minusSeconds(3 * 3600 + 600)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    Pipelines.runToMemory(
      Pipelines.intervalJoinStreams(views, clicks,
          "user_id", "uid_c", "view_ts", "click_ts",
          delay = "1 hour", within = "2 hours",
          joinType = "left_outer")
        .select(col("user_id"), col("view_id"), col("click_id"),
          col("view_ts")))
      .where(col("view_ts") < lit(java.sql.Timestamp.from(cut)))
      .groupBy(col("view_id")).agg(
        first(col("user_id")).as("user_id"),
        count(col("click_id")).as("n_clicks"))
      .where(col("n_clicks") === 0L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_abandoned"))
      .orderBy(col("user_id"))
  }

  /** CHAINED STATEFUL OPERATORS in one streaming query (the round's
    * third streaming plan shape): the q331 stream-stream interval
    * join feeds a tumbling-window aggregation INSIDE the same
    * streaming plan — daily attributed-pair counts, append mode, so
    * the window agg consumes the watermark PROPAGATED through the
    * join's state horizon and each day emits exactly once when
    * adjudicated. Both sides restrict to days whose window END
    * precedes the flush horizon (min of the two streams' max event
    * times − delay − interval − a 1-hour margin for the join's
    * watermark hold-back), applied to the OUTPUT per the q333
    * lesson. */
  val q334 = GQuery("q334_stream_attribution_daily",
    """WITH h AS (
      |  SELECT least(
      |      max(ts) FILTER (WHERE event_type = 'view'),
      |      max(ts) FILTER (WHERE event_type = 'click'))
      |    - INTERVAL 4 HOUR AS cut
      |  FROM events)
      |SELECT date_trunc('day', v.ts) AS day, CAST(count(*) AS BIGINT) AS n_pairs
      |FROM events v JOIN events c
      |  ON v.user_id = c.user_id
      | AND v.event_type = 'view' AND c.event_type = 'click'
      | AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR
      |WHERE date_trunc('day', v.ts) + INTERVAL 1 DAY <= (SELECT cut FROM h)
      |GROUP BY 1 ORDER BY day""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val (ev, evBatch) = eventsStreamed(s, dir)
    val cut = evBatch
      .agg(least(
        max(when(col("event_type") === "view", col("ts"))),
        max(when(col("event_type") === "click", col("ts")))))
      .head().getTimestamp(0).toInstant.minusSeconds(4 * 3600)
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("ts").as("view_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("ts").as("click_ts"))
    val daily = Pipelines.intervalJoinStreams(views, clicks,
        "user_id", "uid_c", "view_ts", "click_ts",
        delay = "1 hour", within = "2 hours")
      .groupBy(window(col("view_ts"), "1 day").as("w"))
      .agg(count(lit(1)).as("n_pairs"))
      .select(col("w.start").as("day"), col("w.end").as("day_end"),
        col("n_pairs"))
    Pipelines.runToMemory(daily)
      .where(col("day_end") <= lit(java.sql.Timestamp.from(cut)))
      .select(col("day"), col("n_pairs"))
      .orderBy(col("day"))
  }

  /** UNMATCHED TRAFFIC on both sides via the FULL-OUTER stream-stream
    * interval join — the remaining face of the state-timeout-emission
    * contract after q331 (inner) and q333 (left_outer): views that
    * never converted AND clicks that never attributed each emit
    * exactly one null-padded row when the watermark adjudicates them,
    * from the SAME symmetric-hash join state. A click is unmatched
    * when no same-user view preceded it by ≤ 2 hours. Both sides
    * restrict to rows older than the flush horizon, applied to the
    * OUTPUT per the q333 lesson (pre-filtering a stream lowers its
    * own watermark and strands the last window's state). Oracle: two
    * full-knowledge NOT EXISTS anti-joins, one per side. */
  val q335 = GQuery("q335_stream_unmatched_traffic",
    """WITH h AS (
      |  SELECT least(
      |      max(ts) FILTER (WHERE event_type = 'view'),
      |      max(ts) FILTER (WHERE event_type = 'click'))
      |    - INTERVAL 3 HOUR - INTERVAL 10 MINUTE AS cut
      |  FROM events),
      |uv AS (
      |  SELECT v.user_id FROM events v
      |  WHERE v.event_type = 'view' AND v.ts < (SELECT cut FROM h)
      |    AND NOT EXISTS (SELECT 1 FROM events c
      |      WHERE c.event_type = 'click' AND c.user_id = v.user_id
      |        AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR)),
      |uc AS (
      |  SELECT c.user_id FROM events c
      |  WHERE c.event_type = 'click' AND c.ts < (SELECT cut FROM h)
      |    AND NOT EXISTS (SELECT 1 FROM events v
      |      WHERE v.event_type = 'view' AND v.user_id = c.user_id
      |        AND c.ts >= v.ts AND c.ts <= v.ts + INTERVAL 2 HOUR))
      |SELECT user_id, 'view' AS side,
      |  CAST(count(*) AS BIGINT) AS n_unmatched
      |FROM uv GROUP BY 1
      |UNION ALL
      |SELECT user_id, 'click' AS side,
      |  CAST(count(*) AS BIGINT) AS n_unmatched
      |FROM uc GROUP BY 1
      |ORDER BY user_id, side""".stripMargin) { (s, dir) =>
    import graft.streaming.Pipelines
    val (ev, evBatch) = eventsStreamed(s, dir)
    val cut = evBatch
      .agg(least(
        max(when(col("event_type") === "view", col("ts"))),
        max(when(col("event_type") === "click", col("ts")))))
      .head().getTimestamp(0).toInstant.minusSeconds(3 * 3600 + 600)
    val cutTs = lit(java.sql.Timestamp.from(cut))
    val views = ev.where(col("event_type") === "view")
      .select(col("user_id"), col("event_id").as("view_id"),
        col("ts").as("view_ts"))
    val clicks = ev.where(col("event_type") === "click")
      .select(col("user_id").as("uid_c"), col("event_id").as("click_id"),
        col("ts").as("click_ts"))
    val out = Pipelines.runToMemory(
      Pipelines.intervalJoinStreams(views, clicks,
          "user_id", "uid_c", "view_ts", "click_ts",
          delay = "1 hour", within = "2 hours",
          joinType = "full_outer")
        .select(col("user_id"), col("uid_c"), col("view_id"),
          col("click_id"), col("view_ts"), col("click_ts")))
    // view side: a view row (matched rows + its possible null-padded
    // timeout row) with zero attributed clicks, adjudicated and old
    // enough
    val unViews = out.where(col("view_id").isNotNull &&
        col("view_ts") < cutTs)
      .groupBy(col("view_id")).agg(
        first(col("user_id")).as("user_id"),
        count(col("click_id")).as("n_clicks"))
      .where(col("n_clicks") === 0L)
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_unmatched"))
      .select(col("user_id"), lit("view").as("side"), col("n_unmatched"))
    // click side: an unmatched click emits exactly one view-null row
    val unClicks = out.where(col("view_id").isNull &&
        col("click_ts") < cutTs)
      .groupBy(col("uid_c"))
      .agg(count(lit(1)).as("n_unmatched"))
      .select(col("uid_c").as("user_id"), lit("click").as("side"),
        col("n_unmatched"))
    unViews.unionByName(unClicks)
      .orderBy(col("user_id"), col("side"))
  }

  val all: Seq[GQuery] =
    Seq(q38, q38b, q39, q40, q41, q42, q46, q209, q210, q329, q331, q333,
      q334, q335)
}
