package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Ordered event-sequence analytics over an event stream table —
  * funnel progression and transition structure, the product-analytics
  * companions to the windowed/sessionized aggregates (q15/q21/q42).
  * Everything is user-keyed (one shuffle per pass, co-partitionable at
  * 100 TB); no MATCH_RECOGNIZE engine is needed because the classic
  * min-after-previous-step rewrite expresses ordered funnels exactly.
  */
object EventOps {

  /** Earliest strictly-ordered funnel completion per user: `t_i` is
    * the first `steps(i)` event AFTER that user's `t_{i-1}` (the
    * canonical "did view, THEN click, THEN purchase" semantics — a
    * purchase before the first view does not count). A user who never
    * reaches step i carries `t_i` (and all later steps) null.
    *
    * One user-keyed aggregate per step: step i's events join the
    * (user, t_0..t_{i-1}) frame — user-population-sized, never
    * event-history-sized — and take `min(ts WHERE ts > t_{i-1})`.
    * Steps are sequential by nature (each needs the previous bound),
    * so the chain length, not the data, bounds the pass count. */
  def funnelTimes(events: DataFrame, userCol: String, tsCol: String,
                  typeCol: String, steps: Seq[String]): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    var acc = events.where(col(typeCol) === steps.head)
      .groupBy(col(userCol).as("user_id"))
      .agg(min(col(tsCol)).as("t0"))
    steps.indices.drop(1).foreach { i =>
      val stepEv = events.where(col(typeCol) === steps(i))
        .select(col(userCol).as("user_id"), col(tsCol).as("__ts"))
      val keys = col("user_id") +: (0 until i).map(j => col(s"t$j"))
      acc = acc.join(stepEv, Seq("user_id"), "left")
        .groupBy(keys: _*)
        .agg(min(when(col("__ts") > col(s"t${i - 1}"), col("__ts")))
          .as(s"t$i"))
    }
    acc
  }

  /** Funnel reach report over [[funnelTimes]]: one row per step with
    * the number of users whose ordered chain got that far. Computed as
    * a melt + keyed aggregate (no driver-side collect). */
  def funnelReport(events: DataFrame, userCol: String, tsCol: String,
                   typeCol: String, steps: Seq[String]): DataFrame = {
    val ft = funnelTimes(events, userCol, tsCol, typeCol, steps)
    val melted = ft.select(explode(array(steps.indices.map { i =>
      struct(lit(i).as("step"), lit(steps(i)).as("step_name"),
        col(s"t$i").isNotNull.cast("long").as("reached"))
    }: _*)).as("x"))
    melted.groupBy(col("x.step").as("step"), col("x.step_name").as("step_name"))
      .agg(sum(col("x.reached")).as("n_users"))
  }

  /** Peak concurrency over intervals (the classic sweep line): the
    * maximum number of simultaneously-active intervals [st, en]
    * (inclusive ends) and the earliest instant it is reached — "max
    * concurrent sessions" for capacity planning.
    *
    * Sweep without a global sort: ±1 delta points bucket by time
    * (`bucketSeconds`), each bucket runs its own keyed cumulative
    * window, and bucket offsets come from one window over the
    * BUCKET-level frame (time-range-bounded — hours in the corpus —
    * never point-bounded; the two-phase prefix-sum shape
    * [[graft.operators.Packing]] uses). Peers at one instant share one
    * RANGE-frame cumulative, so the value on a +1 row IS the inclusive
    * concurrency at that instant (ends at t still count at t) — no
    * tie-break key needed, and the maximum is always attained on a +1
    * row. */
  def peakConcurrency(intervals: DataFrame, stCol: String, enCol: String,
                      bucketSeconds: Long = 3600L): DataFrame = {
    val pts = intervals
      .select(col(stCol).as("ts"), lit(1L).as("delta"))
      .unionAll(intervals.select(col(enCol).as("ts"), lit(-1L).as("delta")))
      .withColumn("bkt", floor(unix_timestamp(col("ts")) / bucketSeconds))
    val wLocal = Window.partitionBy(col("bkt"))
      .orderBy(col("ts"), col("delta").desc)  // default RANGE frame: peers share
    val local = pts.withColumn("cum_local", sum(col("delta")).over(wLocal))
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = pts.groupBy("bkt").agg(sum(col("delta")).as("tot"))
      .withColumn("offset", coalesce(sum(col("tot")).over(wOff), lit(0L)))
      .select("bkt", "offset")
    val cum = local.join(broadcast(offsets), "bkt")
      .withColumn("cc", col("cum_local") + col("offset"))
      .where(col("delta") === 1)
    val peak = cum.agg(max(col("cc")).as("max_concurrent"))
    cum.join(broadcast(peak), col("cc") === col("max_concurrent"))
      .groupBy("max_concurrent").agg(min(col("ts")).as("at_ts"))
      .select(col("max_concurrent"), col("at_ts"))
  }

  /** Per-interval overlap degree — for every interval, how many OTHER
    * intervals overlap it (inclusive ends: touching counts), via the
    * order-statistics identity
    * degree = #(starts ≤ my_end) − #(ends < my_start) − 1,
    * so NO interval join ever happens: two boundary sweeps with probe
    * rows, each the q168 two-phase prefix-sum shape (bucket-local
    * cumulative + broadcast bucket offsets — never a single global
    * sort partition). RANGE-peer window semantics make the ≤ / <
    * asymmetry exact: counted rows order BEFORE probes in the first
    * sweep (inclusive) and AFTER them in the second (strict).
    * `idCol` must uniquely identify an interval; `vCol`s are epoch
    * seconds. Returns the interval rows plus `degree`. */
  def overlapDegree(intervals: DataFrame, idCol: String, stCol: String,
                    enCol: String, bucketSeconds: Long = 3600L): DataFrame = {
    def sweep(countedV: Column, probeV: Column,
              probeFirst: Boolean, out: String): DataFrame = {
      val counted = intervals.select(countedV.as("v"),
        lit(if (probeFirst) 1 else 0).as("ord"), lit(1L).as("delta"),
        lit(null).cast(intervals.schema(idCol).dataType).as("pid"))
      val probes = intervals.select(probeV.as("v"),
        lit(if (probeFirst) 0 else 1).as("ord"), lit(0L).as("delta"),
        col(idCol).as("pid"))
      val pts = counted.unionAll(probes)
        .withColumn("bkt", floor(col("v") / bucketSeconds))
      val wLocal = Window.partitionBy(col("bkt"))
        .orderBy(col("v"), col("ord")) // default RANGE frame: peers share
      val wOff = Window.orderBy(col("bkt"))
        .rowsBetween(Window.unboundedPreceding, -1)
      val offsets = pts.groupBy("bkt").agg(sum(col("delta")).as("tot"))
        .withColumn("offset", coalesce(sum(col("tot")).over(wOff), lit(0L)))
        .select("bkt", "offset")
      pts.withColumn("cum_local", sum(col("delta")).over(wLocal))
        .join(broadcast(offsets), "bkt")
        .where(col("pid").isNotNull)
        .select(col("pid").as(idCol), (col("cum_local") + col("offset")).as(out))
    }
    val c1 = sweep(col(stCol), col(enCol), probeFirst = false, "c_le")
    val c2 = sweep(col(enCol), col(stCol), probeFirst = true, "c_lt")
    intervals.join(c1, idCol).join(c2, idCol)
      .withColumn("degree", col("c_le") - col("c_lt") - lit(1L))
      .drop("c_le", "c_lt")
  }

  /** Sequence-pattern census (the MATCH_RECOGNIZE-shaped workload):
    * each key's event stream collapses to an ordered single-character
    * string (one initial per event type), and a regex counts
    * non-overlapping pattern occurrences per key — "view, then a
    * click, then a purchase, with no intervening purchase" is
    * `v[^p]*c[^p]*p`. The string build is one keyed aggregate
    * (array_sort ∘ collect_list ∘ array_join, all codegen); the match
    * count is one scalar regexp over a per-key string bounded by that
    * key's event count.
    * Returns per key: (key, seq_len, n_matches). */
  def sequencePatternCensus(events: DataFrame, keyCol: String,
                            tsCol: String, tieCol: String,
                            typeCol: String, pattern: String): DataFrame =
    events
      .select(col(keyCol).as("k"),
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          substring(col(typeCol), 1, 1).as("ch")).as("st"))
      .groupBy(col("k"))
      .agg(array_join(transform(array_sort(collect_list(col("st"))),
        x => x.getField("ch")), "").as("seq"))
      .select(col("k").as(keyCol),
        length(col("seq")).cast("long").as("seq_len"),
        regexp_count(col("seq"), lit(pattern)).cast("long")
          .as("n_matches"))

  /** Delta-method confidence interval for a RATIO metric per variant
    * (revenue per event, CTR, items per order): the naive per-user
    * mean-of-ratios is biased and the pooled ratio Σy/Σx has no
    * per-row variance, so the standard readout linearizes:
    * Var(R) ≈ (σ²_y − 2R·cov + R²σ²_x) / (n·x̄²) over per-user (x, y)
    * pairs. Moments are exact 128-bit integer sums; R, the standard
    * error, and the ±1.96 interval are one fixed double shape over
    * them. Returns one row per variant:
    * (variant, n_users, ratio4, se6, ci_lo4, ci_hi4). */
  def ratioDeltaCi(users: DataFrame, variantCol: String, xCol: String,
                   yCol: String): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    users.groupBy(col(variantCol).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col(xCol)).as("sx"), sum(col(yCol)).as("sy"),
        sum((col(xCol) * col(xCol)).cast(dec)).as("sxx"),
        sum((col(yCol) * col(yCol)).cast(dec)).as("syy"),
        sum((col(xCol) * col(yCol)).cast(dec)).as("sxy"))
      .withColumn("r", col("sy").cast("double") / col("sx"))
      .withColumn("mx", col("sx").cast("double") / col("n"))
      .withColumn("vy", (col("syy").cast("double")
        - col("sy").cast("double") * col("sy") / col("n")) / col("n"))
      .withColumn("vx", (col("sxx").cast("double")
        - col("sx").cast("double") * col("sx") / col("n")) / col("n"))
      .withColumn("cxy", (col("sxy").cast("double")
        - col("sx").cast("double") * col("sy") / col("n")) / col("n"))
      .withColumn("se", sqrt((col("vy")
        - lit(2.0) * col("r") * col("cxy")
        + col("r") * col("r") * col("vx"))
        / (col("n") * col("mx") * col("mx"))))
      .select(col("variant"), col("n").as("n_users"),
        round(lit(1e4) * col("r")).cast("long").as("ratio4"),
        round(lit(1e6) * col("se")).cast("long").as("se6"),
        round(lit(1e4) * (col("r") - lit(1.96) * col("se"))).cast("long")
          .as("ci_lo4"),
        round(lit(1e4) * (col("r") + lit(1.96) * col("se"))).cast("long")
          .as("ci_hi4"))
  }

  /** Holt linear (double-exponential) smoothing + h-step forecast per
    * group, α = 0.3 / β = 0.2 as EXACT rational constants: the
    * level/trend recursion l' = (3y + 7(l+b))/10,
    * b' = (2(l'−l) + 8b)/10 runs on the 1e-4 integer grid with
    * round-half-up FLOOR division (floorDiv, matching SQL's `//` on
    * negative trends — truncating division would round negative
    * trends toward zero and diverge from the oracle). The recursion
    * is sequential per group over the zero-filled day spine
    * (time-bounded, not corpus-bounded), so it folds driver-side in
    * BigInt — the KM/BPE bounded-collect discipline — and the oracle
    * replays it as a per-group RECURSIVE CTE. Groups with fewer than
    * 2 days are skipped (no trend to initialize).
    * Returns one row per (group, horizon 1..h):
    * (grp, h, level4, trend4, forecast4). */
  def holtForecast(events: DataFrame, tsCol: String, typeCol: String,
                   horizon: Int = 7): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val days = events.select(col(typeCol).as("grp"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("d"))
    val span = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = days.select(col("grp")).distinct()
      .crossJoin(broadcast(span))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine
      .join(days.groupBy("grp", "d").agg(count(lit(1)).as("y")),
        Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
      .orderBy("grp", "d")
      .collect()  // groups × day span — bounded model state
      .groupBy(_.getString(0))
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && a.signum != b.signum) q - 1 else q
    }
    val out = series.toSeq.sortBy(_._1).flatMap { case (g, rows) =>
      val ys = rows.sortBy(_.getLong(1)).map(r => BigInt(r.getLong(2)))
      if (ys.length < 2) Seq.empty
      else {
        var l = ys(0) * 10000
        var b = (ys(1) - ys(0)) * 10000
        ys.drop(1).foreach { y =>
          val l2 = fdiv(6 * y * 10000 + 14 * (l + b) + 10, 20)
          b = fdiv(4 * (l2 - l) + 16 * b + 10, 20)
          l = l2
        }
        (1 to horizon).map(h =>
          (g, h.toLong, l.toLong, b.toLong, (l + h * b).toLong))
      }
    }
    out.toDF("grp", "h", "level4", "trend4", "forecast4")
  }

  /** Hampel outlier filter over a daily series per group: each day is
    * judged against the MEDIAN of its ±3-day window, flagged when
    * |y − med| exceeds 4.4478·MAD (3σ via the 1.4826 normal-MAD
    * constant, pre-rounded onto the 1e-4 grid so the comparison is
    * pure integers) — the robust despiking standard, immune to the
    * outliers that poison a rolling mean/σ rule. Window medians are
    * LOWER medians ((n+1) div 2 of the sorted window, deterministic
    * for even edge windows); a zero-MAD window (flat neighborhood)
    * flags ANY deviation. The window array (≤ 7 values) is collected
    * per row and the median/MAD arithmetic runs in codegen HOFs over
    * it — one group-partitioned window, no self-joins.
    * Returns (grp, d, y, med, mad, is_outlier). */
  def hampelFilter(events: DataFrame, tsCol: String,
                   typeCol: String): DataFrame = {
    val days = events.select(col(typeCol).as("grp"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("d"))
    val span = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = days.select(col("grp")).distinct()
      .crossJoin(broadcast(span))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine
      .join(days.groupBy("grp", "d").agg(count(lit(1)).as("y")),
        Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.partitionBy(col("grp")).orderBy(col("d"))
      .rowsBetween(-3, 3)
    series
      .withColumn("arr", sort_array(collect_list(col("y")).over(w)))
      .withColumn("med", element_at(col("arr"),
        ((size(col("arr")) + 1) / 2).cast("int")))
      .withColumn("mad", element_at(
        sort_array(transform(col("arr"),
          v => abs(v - col("med")))),
        ((size(col("arr")) + 1) / 2).cast("int")))
      .select(col("grp"), col("d"), col("y"), col("med"), col("mad"),
        (abs(col("y") - col("med")) * 10000L > lit(44478L) * col("mad"))
          .as("is_outlier"))
  }

  /** Markov-chain conversion attribution (removal effects — the
    * data-driven alternative to first/last-touch): user event streams
    * split into journeys at each conversion; transitions
    * START → touchpoints → (CONV | NULL) form a Markov chain, and a
    * channel's credit is how much the START→CONV absorption
    * probability DROPS when that channel is removed (redirected to
    * NULL, i.e. its absorption value pinned to 0) — a channel that
    * only appears on paths that convert anyway gets little credit, a
    * bottleneck channel gets a lot.
    *
    * Exactness: the transition census is distributed and exact; the
    * absorption fixpoint runs `iters` rounds on a 1e-8 integer grid
    * with round-half-up per state, a(s)' = (2·(Σ_t n(s→t)·a(t) +
    * n(s→CONV)·10⁸) + rs) div (2·rs) — pure integer arithmetic over
    * the CHANNEL-SIZED matrix (collected driver-side: bounded model
    * state, the BPE-census discipline), replayed by the oracle as a
    * per-scenario chained-CTE ladder. One scenario per channel plus
    * the base chain.
    *
    * Scale: journeys and transitions are two windows over
    * user-partitioned streams + one census; everything after is
    * channels² driver math. Returns one row per channel:
    * (channel, base_conv8, removed_conv8, removal_effect8, share6). */
  def markovAttribution(events: DataFrame, userCol: String, tsCol: String,
                        tieCol: String, typeCol: String, convType: String,
                        iters: Int = 20): DataFrame = {
    val spark = events.sparkSession
    import spark.implicits._
    val w = Window.partitionBy(col("u")).orderBy(col("ts"), col("tie"))
    val base = events.select(col(userCol).as("u"), col(tsCol).as("ts"),
        col(tieCol).as("tie"), col(typeCol).as("et"))
      .withColumn("jid", coalesce(sum(
        when(col("et") === convType, 1L).otherwise(0L))
        .over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
    val wj = Window.partitionBy(col("u"), col("jid"))
      .orderBy(col("ts"), col("tie"))
    val tr = base
      .withColumn("prev", lag(col("et"), 1).over(wj))
      .withColumn("src", coalesce(col("prev"), lit("START")))
      .withColumn("dst", when(col("et") === convType, lit("CONV"))
        .otherwise(col("et")))
      .select(col("u"), col("jid"), col("src"), col("dst"))
    // journeys that never convert end in NULL: the last event of a
    // jid whose dst isn't CONV emits one terminal transition
    val wl = Window.partitionBy(col("u"), col("jid"))
      .orderBy(col("ts").desc, col("tie").desc)
    val tails = base
      .withColumn("rn", row_number().over(wl))
      .where(col("rn") === 1 && col("et") =!= convType)
      .select(col("et").as("src"), lit("NULL").as("dst"))
    val census = tr.select(col("src"), col("dst"))
      .unionByName(tails)
      .groupBy("src", "dst").agg(count(lit(1)).as("n"))
      .collect()  // channels² cells — bounded model state
      .map(r => (r.getString(0), r.getString(1)) -> r.getAs[Long]("n"))
      .toMap
    val channels = census.keysIterator.flatMap { case (s, d) => Seq(s, d) }
      .filter(x => x != "START" && x != "CONV" && x != "NULL")
      .toSeq.distinct.sorted
    val states = "START" +: channels
    val rowSum = states.map(s =>
      s -> census.collect { case ((a, _), n) if a == s => n }.sum).toMap
    def absorb(removed: Option[String]): Long = {
      // BigInt: n·a(t) is count × 1e8 — past long range at web-scale
      // transition counts; the oracle's HUGEINT arithmetic matches
      var a = states.map(_ -> BigInt(0)).toMap
      for (_ <- 1 to iters) {
        a = states.map { s =>
          val rs = BigInt(rowSum(s))
          if (rs == 0) s -> BigInt(0)
          else {
            val acc = census.iterator.collect {
              case ((x, t), n) if x == s =>
                if (t == "CONV") BigInt(n) * 100000000L
                else if (t == "NULL" || removed.contains(t)) BigInt(0)
                else BigInt(n) * a.getOrElse(t, BigInt(0))
            }.sum
            s -> (2 * acc + rs) / (2 * rs)
          }
        }.toMap
      }
      a("START").toLong
    }
    val baseConv = absorb(None)
    val rows = channels.map { c =>
      val rem = absorb(Some(c))
      (c, baseConv, rem, baseConv - rem)
    }
    val reSum = rows.map(_._4).sum
    rows.map { case (c, b, r, re) =>
      (c, b, r, re,
        if (reSum > 0) (2L * re * 1000000L + reSum) / (2L * reSum) else 0L)
    }.toDF("channel", "base_conv8", "removed_conv8", "removal_effect8",
      "share6")
  }

  /** Log-rank test (Mantel '66): do two groups' right-censored
    * survival curves differ — the significance companion to
    * [[kaplanMeier]] (two KM curves can LOOK apart and still be
    * noise). At each distinct event time, group A's observed events
    * are compared with the hypergeometric expectation given the
    * pooled risk set, and the per-time (O−E) and variance terms
    * accumulate into z = Σ(O−E)/√ΣV. Each time's two terms are
    * snapped to the 1e-6 grid BEFORE the sum (the per-part rounding
    * idiom) so the totals are order-free integer sums and a SQL
    * oracle replays them bit-identically; the final z is one fixed
    * double expression.
    *
    * `lives` rows are (t, event, group) subjects as in
    * [[kaplanMeier]]; censored subjects shape the risk sets but
    * contribute no event terms. Same census + value-spine-window
    * shape as the KM estimator — nothing corpus-sized ever sorts
    * globally. Returns one row:
    * (n_a, n_b, n_event_times, o_minus_e6, var6, z4). */
  def logRank(lives: DataFrame, tCol: String, eventCol: String,
              groupCol: String, gA: String, gB: String): DataFrame = {
    val cells = lives.where(col(groupCol).isin(gA, gB))
      .select(col(tCol).as("t"),
        when(col(groupCol) === gA, 1L).otherwise(0L).as("isa"),
        when(col(eventCol).cast("long") =!= 0L, 1L).otherwise(0L)
          .as("ev"))
      .groupBy(col("t"))
      .agg(sum(col("isa")).as("m1"),
        sum(lit(1L) - col("isa")).as("m2"),
        sum(col("isa") * col("ev")).as("d1"),
        sum((lit(1L) - col("isa")) * col("ev")).as("d2"))
    val w = Window.orderBy(col("t"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val tot = cells.agg(sum(col("m1")).as("na"), sum(col("m2")).as("nb"))
    val spine = cells
      .withColumn("b1", coalesce(sum(col("m1")).over(w), lit(0L)))
      .withColumn("b2", coalesce(sum(col("m2")).over(w), lit(0L)))
      .crossJoin(broadcast(tot))
      .withColumn("n1", col("na") - col("b1"))
      .withColumn("n2", col("nb") - col("b2"))
      .withColumn("nt", col("n1") + col("n2"))
      .withColumn("d", col("d1") + col("d2"))
      .where(col("d") > 0L && col("nt") > 1L)
      .select(col("na"), col("nb"),
        round(lit(1e6) * (col("d1").cast("double")
          - col("d").cast("double") * col("n1") / col("nt")))
          .cast("long").as("ome6"),
        round(lit(1e6) * col("d").cast("double")
          * (col("n1").cast("double") / col("nt"))
          * (col("n2").cast("double") / col("nt"))
          * (col("nt") - col("d")).cast("double")
          / (col("nt") - lit(1L))).cast("long").as("v6"))
    spine.groupBy(col("na"), col("nb"))
      .agg(count(lit(1)).as("n_event_times"),
        sum(col("ome6")).as("o_minus_e6"), sum(col("v6")).as("var6"))
      .select(col("na").as("n_a"), col("nb").as("n_b"),
        col("n_event_times"), col("o_minus_e6"), col("var6"),
        when(col("var6") > 0L,
          round(lit(1e4) * (col("o_minus_e6").cast("double") / 1e6)
            / sqrt(col("var6").cast("double") / 1e6)).cast("long"))
          .otherwise(lit(0L)).as("z4"))
  }

  /** Calendar-spine gap fill with LOCF (last observation carried
    * forward): per key, materialize EVERY day bucket between the
    * key's first and last active day, left-join the daily aggregate,
    * and forward-fill missing days from the most recent observed one —
    * the dashboard/time-series-join prerequisite that turns a sparse
    * event log into a dense regular series (a rolling average over
    * the raw log silently contracts over gaps). Rows created for gap
    * days carry n_events = 0, is_gap = true, and the carried total.
    *
    * Scale: the spine explode is per key × its OWN span (never the
    * global calendar times every key), the join is keyed on
    * (key, day), and the fill is one key-partitioned window.
    * Returns (key, d, n_events, day_total, filled_total, is_gap). */
  def gapFillLocf(events: DataFrame, keyCol: String, tsCol: String,
                  valueCol: String): DataFrame = {
    val daily = events.select(col(keyCol).as("k"),
        floor(unix_timestamp(col(tsCol)) / 86400L).as("d"),
        round(col(valueCol) * 100).cast("long").as("c"))
      .groupBy("k", "d")
      .agg(sum(col("c")).as("day_total"), count(lit(1)).as("n_events"))
    val spine = daily.groupBy("k")
      .agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
      .select(col("k"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val w = Window.partitionBy(col("k")).orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, 0)
    spine.join(daily, Seq("k", "d"), "left")
      .select(col("k").as(keyCol), col("d"),
        coalesce(col("n_events"), lit(0L)).as("n_events"),
        col("day_total"),
        last(col("day_total"), ignoreNulls = true).over(w)
          .as("filled_total"),
        col("day_total").isNull.as("is_gap"))
  }

  /** Sequential probability ratio test (Wald '45) over an ordered
    * Bernoulli trial stream — the "stop the experiment early" monitor:
    * after each trial the cumulative log-likelihood ratio between two
    * conversion hypotheses either crosses the upper bound (accept H1),
    * the lower (accept H0), or continues. Because the per-trial LLR
    * increments are two CONSTANTS (success → ln(p1/p0), failure →
    * ln((1−p1)/(1−p0))), the walk is linear in the cumulative counts:
    * llr = k·a6 + (n−k)·b6 — callers pass the four grid constants
    * (increments and bounds pre-rounded to 1e-6), so the whole scan is
    * pure integer arithmetic; no runtime ln anywhere, and a SQL oracle
    * replays it bit-identically.
    *
    * The global trial cumulative runs as the q168 two-phase prefix sum
    * (bucket-local window + broadcast bucket offsets — never a single
    * global sort partition). Returns ONE row:
    * (n_total, k_total, llr6_final, n_at_decision, decision) with
    * decision ∈ accept_h1 | accept_h0 | continue (n_at_decision null
    * when the walk never crossed). */
  def sprtBinary(trials: DataFrame, tsCol: String, tieCol: String,
                 success: Column, a6: Long, b6: Long,
                 up6: Long, lo6: Long,
                 bucketSeconds: Long = 86400L): DataFrame = {
    val rows = trials.select(unix_timestamp(col(tsCol)).as("sec"),
        col(tieCol).as("tie"),
        when(success, 1L).otherwise(0L).as("s"))
      .withColumn("bkt", floor(col("sec") / bucketSeconds))
    val wL = Window.partitionBy(col("bkt")).orderBy(col("sec"), col("tie"))
      .rowsBetween(Window.unboundedPreceding, 0)
    val wOff = Window.orderBy(col("bkt"))
      .rowsBetween(Window.unboundedPreceding, -1)
    val offs = rows.groupBy("bkt")
      .agg(sum(col("s")).as("sk"), count(lit(1)).as("sn"))
      .withColumn("ok", coalesce(sum(col("sk")).over(wOff), lit(0L)))
      .withColumn("on", coalesce(sum(col("sn")).over(wOff), lit(0L)))
      .select("bkt", "ok", "on")
    val cum = rows
      .withColumn("ckl", sum(col("s")).over(wL))
      .withColumn("cnl", count(lit(1)).over(wL))
      .join(broadcast(offs), "bkt")
      .withColumn("k", col("ckl") + col("ok"))
      .withColumn("n", col("cnl") + col("on"))
      .withColumn("llr6",
        col("k") * a6 + (col("n") - col("k")) * b6)
    val crossed = cum.where(col("llr6") >= up6 || col("llr6") <= lo6)
    val firstN = crossed.agg(min(col("n")).as("n_dec"))
    val dec = crossed.join(broadcast(firstN), col("n") === col("n_dec"))
      .select(col("n").as("n_at_decision"),
        col("llr6").as("llr6_at_decision"))
    cum.agg(max(col("n")).as("n_total"), max(col("k")).as("k_total"),
        max_by(col("llr6"), col("n")).as("llr6_final"))
      .join(broadcast(dec), lit(true), "left")
      .select(col("n_total"), col("k_total"), col("llr6_final"),
        col("n_at_decision"),
        when(col("llr6_at_decision") >= up6, "accept_h1")
          .when(col("llr6_at_decision") <= lo6, "accept_h0")
          .otherwise("continue").as("decision"))
  }

  /** Time-weighted average value (TWAP) per (group, time bucket): the
    * trapezoid integral of the value polyline between consecutive
    * events, divided by the observed span — the fair average for
    * irregularly-sampled series, where a plain mean over-weights bursts
    * (five readings in one minute should not outvote one reading that
    * held for an hour). Exact inputs: values on the cents grid,
    * per-segment area 2·A = (c_i + c_{i+1})·(t_{i+1} − t_i) summed in
    * 128-bit decimal; the final round-half-up
    * floor((2·Σ + 2·span) / (4·span)) runs on longs through ONE double
    * division — both operands are exact ≤ 2⁵³ and the quotient sits
    * ≥ 1/(4·span) from any integer, far beyond double error, so the
    * floor replays IEEE-identically in any engine. Buckets with a
    * single event (span 0) are emitted with twap2 = the event's own
    * cents value.
    *
    * Scale: one (group, bucket)-partitioned window for the lead, one
    * keyed aggregate. Returns (grp, bkt, n_events, span_s, twap2). */
  def twap(events: DataFrame, groupCol: String, tsCol: String,
           tieCol: String, valueCol: String,
           bucketSeconds: Long = 86400L): DataFrame = {
    val dec = org.apache.spark.sql.types.DataTypes.createDecimalType(38, 0)
    val rows = events.select(col(groupCol).as("grp"),
        unix_timestamp(col(tsCol)).as("sec"), col(tieCol).as("tie"),
        round(col(valueCol) * 100).cast("long").as("c"))
      .withColumn("bkt", floor(col("sec") / bucketSeconds))
    val w = Window.partitionBy(col("grp"), col("bkt"))
      .orderBy(col("sec"), col("tie"))
    rows
      .withColumn("ns", lead(col("sec"), 1).over(w))
      .withColumn("nc", lead(col("c"), 1).over(w))
      .groupBy(col("grp"), col("bkt"))
      .agg(count(lit(1)).as("n_events"),
        (max(col("sec")) - min(col("sec"))).as("span_s"),
        sum(when(col("ns").isNotNull,
          ((col("c") + col("nc")) * (col("ns") - col("sec"))).cast(dec))
          .otherwise(lit(0L).cast(dec))).as("a2"),
        min_by(col("c"), struct(col("sec"), col("tie"))).as("c0"))
      .select(col("grp"), col("bkt"), col("n_events"), col("span_s"),
        when(col("span_s") === 0L, col("c0"))
          .otherwise(floor(
            (lit(2L) * col("a2").cast("long") + lit(2L) * col("span_s"))
              / (lit(4L) * col("span_s"))).cast("long")).as("twap2"))
  }

  /** Clamped running balance per key — the inventory/wallet fold SQL
    * windows cannot express: balance' = max(0, balance + delta) in
    * event order, where the clamp makes each step depend on the
    * PREVIOUS clamped value (a plain windowed cumulative sum with a
    * greatest() on top under-counts: one deep overdraft would mask
    * later activity instead of resetting at zero). Runs entirely
    * inside whole-stage codegen: per key, `array_sort(collect_list(
    * struct(ts, tie, delta)))` then the `aggregate` higher-order
    * function folds the sequence with a struct accumulator — pure
    * integer arithmetic, so a recursive-CTE oracle replays it
    * bit-identically. Returns per key: (key, n_events, final_bal,
    * n_clamped, max_bal) with n_clamped = how many steps hit the
    * floor.
    *
    * Scale: one keyed aggregate; the per-key array is bounded by that
    * key's event count (the q21 sessionize discipline — user-sized,
    * not corpus-sized). A pathological mega-key would move this to a
    * repartition+sortWithinPartitions mapPartitions fold; the HOF
    * form keeps the common case in codegen. */
  def clampedBalance(df: DataFrame, keyCol: String, tsCol: String,
                     tieCol: String, deltaCol: String): DataFrame = {
    val folded = df
      .select(col(keyCol).as("k"),
        struct(col(tsCol).as("ts"), col(tieCol).as("tie"),
          col(deltaCol).cast("long").as("d")).as("st"))
      .groupBy(col("k"))
      .agg(array_sort(collect_list(col("st"))).as("arr"))
      .select(col("k"), size(col("arr")).cast("long").as("n_events"),
        aggregate(col("arr"),
          struct(lit(0L).as("bal"), lit(0L).as("clamps"),
            lit(0L).as("maxb")),
          (acc, x) => {
            val nb = acc.getField("bal") + x.getField("d")
            val cb = greatest(nb, lit(0L))
            struct(cb.as("bal"),
              (acc.getField("clamps")
                + when(nb < 0L, 1L).otherwise(0L)).as("clamps"),
              greatest(acc.getField("maxb"), cb).as("maxb"))
          }).as("f"))
    folded.select(col("k").as(keyCol), col("n_events"),
      col("f.bal").as("final_bal"), col("f.clamps").as("n_clamped"),
      col("f.maxb").as("max_bal"))
  }

  /** Kaplan–Meier product-limit survival over right-censored
    * durations: `lives` holds one row per subject with a duration
    * `tCol` and an indicator `eventCol` (non-zero = the event was
    * OBSERVED at t; zero = censored at t — the subject left
    * observation still event-free, so its duration is only a lower
    * bound). At each distinct observed-event duration t: n = subjects
    * with duration ≥ t (at risk — censored subjects count until they
    * drop out, the whole point of KM vs a naive histogram), d =
    * events at t, and S(t) multiplies by (n−d)/n.
    *
    * Engine-exact survival without libm: the product chain runs on a
    * 1e-8 integer grid with per-step round-half-up,
    * s' = (2·s·(n−d) + n) div (2n) — pure integer arithmetic, so a
    * SQL oracle replays the chain as a bounded RECURSIVE CTE
    * bit-identically (no exp∘Σlog drift). The chain is inherently
    * sequential, so the step spine (one row per DISTINCT duration —
    * time-granular, bounded by the observation span, NOT by subject
    * count) is collected and folded driver-side in BigInt: the
    * bounded-model-state collect discipline, same as the BPE census.
    * Everything subject-sized (the duration census) stays distributed.
    * Returns one row per observed-event duration:
    * (t, n_risk, d_churn, s8). */
  def kaplanMeier(lives: DataFrame, tCol: String,
                  eventCol: String): DataFrame = {
    val spark = lives.sparkSession
    val spine = lives
      .select(col(tCol).as("t"),
        when(col(eventCol).cast("long") =!= 0L, 1L).otherwise(0L).as("ev"))
      .groupBy("t")
      .agg(count(lit(1)).as("m"), sum(col("ev")).as("d"))
      .orderBy("t")
    val rows = spine.collect()  // bounded: one row per distinct duration
    val n = rows.map(_.getAs[Long]("m")).sum
    var below = 0L
    var s8 = BigInt(100000000L)
    val out = Seq.newBuilder[(Long, Long, Long, Long)]
    rows.foreach { r =>
      val (t, m, d) = (r.getAs[Long]("t"), r.getAs[Long]("m"),
        r.getAs[Long]("d"))
      if (d > 0) {
        val risk = n - below
        s8 = (2 * s8 * (risk - d) + risk) / (2 * risk)
        out += ((t, risk, d, s8.toLong))
      }
      below += m
    }
    import spark.implicits._
    out.result().toDF("t", "n_risk", "d_churn", "s8")
  }

  /** Interval union per key (gaps-and-islands): merge overlapping
    * [st, en] intervals (inclusive integer endpoints; sharing an
    * endpoint merges, adjacency does not) and report per key the
    * merged coverage — the "total busy time"
    * question naive SUM(en−st) double-counts whenever intervals
    * overlap. Classic single-pass shape: sort within key, an interval
    * opens a new island iff its start exceeds the running max of all
    * previous ends (running max — not lag(en) — or a long interval
    * swallowing short ones splits an island), islands = cumulative sum
    * of those flags, then one keyed aggregate per island.
    * Returns per key: (key, n_intervals, n_islands, covered, span)
    * where covered = Σ island lengths and span = max en − min st + 1
    * (so span − covered is the key's total idle gap).
    *
    * Scale: both windows partition by the key — no global sort; the
    * per-key interval count bounds the window buffer. */
  def intervalCoverage(intervals: DataFrame, keyCol: String,
                       stCol: String, enCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col("st"), col("en"))
    val islands = intervals
      .select(col(keyCol), col(stCol).as("st"), col(enCol).as("en"))
      .withColumn("prev_max",
        max(col("en")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("ns",
        when(col("prev_max").isNull || col("st") > col("prev_max"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("ns")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col(keyCol), col("island"))
      .agg(count(lit(1)).as("n_iv"),
        min(col("st")).as("ist"), max(col("en")).as("ien"))
    islands.groupBy(col(keyCol))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("ien") - col("ist") + lit(1L)).as("covered"),
        (max(col("ien")) - min(col("ist")) + lit(1L)).as("span"))
  }

  /** OHLC bars (candle aggregation): per (group, time bucket) the
    * first/max/min/last of a value ordered by (ts, tie id) — the
    * financial-bar shape, equally the right summary for any metric
    * stream. `max_by`/`min_by` on the (ts, id) struct give open/close
    * in ONE keyed aggregate (map-side partials; no window, no sort). */
  def ohlcBars(events: DataFrame, groupCol: String, tsCol: String,
               orderCol: String, valCol: String,
               bucketSeconds: Long = 86400L): DataFrame = {
    // one exact scalar ordering key (decimal — micros × 10^7 + tie id,
    // no 64-bit overflow, no struct-comparison semantics to match
    // across engines); orderCol must stay below 10^7
    val key = (unix_micros(col(tsCol)).cast("decimal(38,0)") *
      lit(10000000L) + col(orderCol)).as("__k")
    events
      .select(col(groupCol).as("grp"),
        floor(unix_timestamp(col(tsCol)) / bucketSeconds).as("bkt"),
        key, col(valCol).as("v"))
      .groupBy("grp", "bkt")
      .agg(count(lit(1)).as("n"),
        min_by(col("v"), col("__k")).as("open"),
        max(col("v")).as("high"),
        min(col("v")).as("low"),
        max_by(col("v"), col("__k")).as("close"))
  }

  /** Cohort retention matrix: users grouped by first-activity bucket
    * (the cohort), counted by how many were active again k buckets
    * later — the product-analytics retention triangle. Two keyed
    * aggregates: first-seen per user, then distinct (cohort, offset,
    * user) counts; nothing is user-history-sized in any shuffle row. */
  def cohortRetention(events: DataFrame, userCol: String, tsCol: String,
                      bucketSeconds: Long = 86400L): DataFrame = {
    val acts = events.select(col(userCol).as("user_id"),
      floor(unix_timestamp(col(tsCol)) / bucketSeconds).as("bkt"))
      .distinct()
    val first = acts.groupBy("user_id").agg(min(col("bkt")).as("cohort"))
    acts.join(first, "user_id")
      .select(col("cohort"), (col("bkt") - col("cohort")).as("offset"),
        col("user_id"))
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
  }

  /** Event-type transition counts (the first-order Markov census): per
    * user, consecutive (ts, tie-break id)-ordered event pairs, counted
    * by (from_type, to_type). The what-happens-next structure a
    * product/anomaly dashboard reads; a burst of error→error
    * transitions is the classic incident signature. One user-keyed
    * window + one (from, to)-keyed aggregate (≤ |types|² cells). */
  def transitionCounts(events: DataFrame, userCol: String, tsCol: String,
                       orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    events
      .select(col(userCol), col(typeCol).as("from_type"),
        lead(col(typeCol), 1).over(w).as("to_type"))
      .where(col("to_type").isNotNull)
      .groupBy("from_type", "to_type")
      .agg(count(lit(1)).as("n_transitions"))
  }

  /** In-sample backtest of the first-order Markov next-event
    * predictor: for each state, predict the modal next event (from
    * [[transitionCounts]]; count ties resolve to the lexicographically
    * SMALLEST successor) and report how often that prediction is right
    * — the baseline any sequence model must beat before it earns a
    * place in the pipeline. Returns per state:
    * (from_type, predicted_next, n_transitions, n_correct, acc4).
    *
    * Scale: everything after the transition census lives on
    * (state × state) cells; the argmax and the accuracy roll-up never
    * touch raw events, and the predictor map broadcasts. */
  def markovBacktest(events: DataFrame, userCol: String, tsCol: String,
                     orderCol: String, typeCol: String): DataFrame = {
    val tc = transitionCounts(events, userCol, tsCol, orderCol, typeCol)
    // min(struct(−n, to)) = largest count, then smallest successor
    val pred = tc.groupBy(col("from_type"))
      .agg(min(struct((-col("n_transitions")).as("neg_n"), col("to_type")))
        .as("b"))
      .select(col("from_type"), col("b.to_type").as("predicted_next"))
    tc.join(broadcast(pred), "from_type")
      .groupBy(col("from_type"), col("predicted_next"))
      .agg(sum(col("n_transitions")).as("n_transitions"),
        sum(when(col("to_type") === col("predicted_next"),
          col("n_transitions")).otherwise(0L)).as("n_correct"))
      .withColumn("acc4", round(lit(1e4) * col("n_correct")
        / col("n_transitions")).cast("long"))
  }

  /** EWMA anomaly baseline per event type: daily counts over the full
    * day spine (absent days count 0 — a feed going quiet IS the
    * anomaly), folded through an exponentially-weighted moving average
    * with rational α = num/den on the 1e-4 integer grid:
    * `e_t = ⌊((den−num)·e_{t−1} + num·n_t·10⁴) / den⌋`, zero-seeded.
    * Output per type: the last day, its count, the final baseline
    * `ewma4`, and the deviation `dev4 = n·10⁴ − ewma4` — the burst /
    * die-off alarm.
    *
    * Engine-parity shape: the fold runs as a higher-order `aggregate`
    * over the per-type day array (bounded by the corpus's day span,
    * collected AFTER the daily aggregate — never raw events), with
    * floor division at every step, so any engine replays the
    * recursion bit-exactly — no compounding float drift, which is
    * what makes an EWMA otherwise un-oracle-able. */
  def ewmaBaseline(events: DataFrame, tsCol: String, typeCol: String,
                   alphaNum: Int = 1, alphaDen: Int = 4): DataFrame = {
    require(alphaNum >= 1 && alphaDen > alphaNum, "need 0 < α < 1 rational")
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val spine = types.crossJoin(days)
    val full = spine.join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
    val keep = (alphaDen - alphaNum).toLong
    full.groupBy("etype")
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("arr"))
      .select(col("etype"),
        element_at(col("arr"), -1).getField("day").as("last_day"),
        element_at(col("arr"), -1).getField("n").as("n_last"),
        aggregate(transform(col("arr"), x => x.getField("n") * 10000L),
          lit(0L),
          (acc, n4) => floor((acc * keep + n4 * alphaNum) / alphaDen))
          .as("ewma4"))
      .withColumn("dev4", col("n_last") * 10000L - col("ewma4"))
  }

  /** Exact autocorrelation function (ACF) of the daily count series
    * per event type, lags 1..maxLag — the periodicity detector beside
    * [[seasonalCensus]] (a weekly-cycled feed shows r₇ ≫ r₁). Runs on
    * the same zero-filled day spine as [[ewmaBaseline]] (absent days
    * ARE the signal), and clears the float-determinism bar by scaling
    * the textbook estimator
    * rₖ = Σ(xₜ−x̄)(xₜ₊ₖ−x̄) / Σ(xₜ−x̄)²  by T²: with S = Σx, Q = Σx²,
    * Cₖ = Σxₜxₜ₊ₖ and head/tail sums Aₖ/Bₖ, the ratio becomes
    * [T²Cₖ − T·S·(Aₖ+Bₖ) + (T−k)S²] / [T²Q − T·S²] — pure integers
    * until ONE final double division onto the 1e-4 grid. Constant
    * series (zero variance) are omitted. Returns
    * (etype, lag, n_pairs, r4).
    *
    * Scale: raw events collapse to the (type × day) spine in one
    * aggregate; the lagged self-join and the per-lag conditional sums
    * run on spine × maxLag rows — day-span-bounded, never row-bounded.
    * The integer products grow as T²·S²/T ≈ S²·T (switch the three
    * product columns to decimal(38) if a single type's count exceeds
    * ~10⁶·day-span). */
  def autocorrelation(events: DataFrame, tsCol: String, typeCol: String,
                      maxLag: Int = 7): DataFrame = {
    require(maxLag >= 1, "maxLag must be positive")
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val lags = events.sparkSession.range(1, maxLag + 1)
      .select(col("id").as("k"))
    val tot = full.groupBy("etype").agg(count(lit(1)).as("t"),
      sum(col("n")).as("s"), sum(col("n") * col("n")).as("qq"),
      min(col("day")).as("mind"), max(col("day")).as("maxd"))
    val ab = full.join(broadcast(tot.select("etype", "mind", "maxd")), "etype")
      .crossJoin(broadcast(lags))
      .groupBy(col("etype"), col("k"))
      .agg(sum(when(col("day") <= col("maxd") - col("k"), col("n"))
          .otherwise(0L)).as("ak"),
        sum(when(col("day") >= col("mind") + col("k"), col("n"))
          .otherwise(0L)).as("bk"))
    val ck = full.crossJoin(broadcast(lags))
      .withColumn("d2", col("day") + col("k"))
      .join(full.select(col("etype"), col("day").as("d2"),
        col("n").as("x2")), Seq("etype", "d2"))
      .groupBy(col("etype"), col("k"))
      .agg(sum(col("n") * col("x2")).as("ck"))
    val num = col("t") * col("t") * col("ck") -
      col("t") * col("s") * (col("ak") + col("bk")) +
      (col("t") - col("k")) * col("s") * col("s")
    val den = col("t") * col("t") * col("qq") - col("t") * col("s") * col("s")
    ck.join(ab, Seq("etype", "k")).join(broadcast(tot), "etype")
      .where(den > 0L)
      .select(col("etype"), col("k").as("lag"),
        (col("t") - col("k")).as("n_pairs"),
        round(lit(1e4) * num.cast("double") / den.cast("double"))
          .cast("long").as("r4"))
  }

  /** Lead–lag cross-correlation between every ordered pair of event
    * types' daily count series, lags 0..maxLag — the causality-shaped
    * sibling of [[autocorrelation]] ("do clicks lead purchases by a
    * day?"): r_xy(k) correlates x_t with y_{t+k}, so a peak at k > 0
    * means x LEADS y by k days. Same zero-filled day spine, same
    * integer-exact scaling: with C_k = Σx_t·y_{t+k}, head/tail sums
    * A_k/B_k and per-series (S, Q),
    * num·T² = T²C_k − T·S_y·A_k − T·S_x·B_k + (T−k)·S_x·S_y and the
    * normalizer is √(D_x·D_y) of the full-series variances — integers
    * until one final double division. Zero-variance series omitted.
    * Returns (ex, ey, lag, n_pairs, r4) for ex ≠ ey (lag 0 appears in
    * both orientations — it is the plain correlation matrix).
    *
    * Scale: identical to [[autocorrelation]] — spine cells × lags ×
    * type pairs, never raw rows. */
  def crossCorrelation(events: DataFrame, tsCol: String, typeCol: String,
                       maxLag: Int = 7): DataFrame = {
    require(maxLag >= 0, "maxLag must be nonnegative")
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("n"), lit(0L)).as("n"))
    val lags = events.sparkSession.range(0, maxLag + 1)
      .select(col("id").as("k"))
    val tot = full.groupBy("etype").agg(count(lit(1)).as("t"),
      sum(col("n")).as("s"), sum(col("n") * col("n")).as("qq"),
      min(col("day")).as("mind"), max(col("day")).as("maxd"))
    val ab = full.join(broadcast(tot.select("etype", "mind", "maxd")), "etype")
      .crossJoin(broadcast(lags))
      .groupBy(col("etype"), col("k"))
      .agg(sum(when(col("day") <= col("maxd") - col("k"), col("n"))
          .otherwise(0L)).as("ak"),
        sum(when(col("day") >= col("mind") + col("k"), col("n"))
          .otherwise(0L)).as("bk"))
    val ck = full.select(col("etype").as("ex"), col("day"), col("n").as("x"))
      .crossJoin(broadcast(lags))
      .withColumn("d2", col("day") + col("k"))
      .join(full.select(col("etype").as("ey"), col("day").as("d2"),
        col("n").as("y")), Seq("d2"))
      .where(col("ex") =!= col("ey"))
      .groupBy(col("ex"), col("ey"), col("k"))
      .agg(sum(col("x") * col("y")).as("ck"))
    val num = col("t") * col("t") * col("ck") -
      col("t") * col("sy") * col("ak") -
      col("t") * col("sx") * col("bk") +
      (col("t") - col("k")) * col("sx") * col("sy")
    val dx = col("t") * col("t") * col("qx") - col("t") * col("sx") * col("sx")
    val dy = col("t") * col("t") * col("qy") - col("t") * col("sy") * col("sy")
    ck.join(ab.select(col("etype").as("ex"), col("k"), col("ak")),
        Seq("ex", "k"))
      .join(ab.select(col("etype").as("ey"), col("k"), col("bk")),
        Seq("ey", "k"))
      .join(broadcast(tot.select(col("etype").as("ex"), col("s").as("sx"),
        col("qq").as("qx"), col("t"))), Seq("ex"))
      .join(broadcast(tot.select(col("etype").as("ey"), col("s").as("sy"),
        col("qq").as("qy"))), Seq("ey"))
      .where(dx > 0L && dy > 0L)
      .select(col("ex"), col("ey"), col("k").as("lag"),
        (col("t") - col("k")).as("n_pairs"),
        round(lit(1e4) * (num.cast("double")
          / sqrt(dx.cast("double") * dy.cast("double"))))
          .cast("long").as("r4"))
  }

  /** Structural trend break per event type — the Chow-test shape: fit
    * one line to the daily count series, fit two lines around every
    * candidate breakpoint, and report the split whose SSE reduction is
    * largest (with both segments' slopes) — [[cusum]] finds LEVEL
    * shifts, this finds SLOPE changes. Runs on the zero-filled day
    * spine with x re-centered to day−minDay; all segment SSEs come
    * from prefix/suffix SUFFICIENT STATISTICS (n, Σx, Σy, Σx², Σxy,
    * Σy² — cumulative windows over the day cells), so each candidate
    * costs O(1) and the whole sweep never re-touches rows. SSE uses
    * the centered closed form
    * [(nΣy²−Sy²)(nΣx²−Sx²) − (nΣxy−SxSy)²] / [n(nΣx²−Sx²)] — exact
    * integers into ONE fixed double shape (the q194 idiom); gains
    * round to the 1e-4 grid, ties resolve to the EARLIEST break day.
    * Returns (etype, break_day, n_left, n_right, gain4, slope_l6,
    * slope_r6) — break_day is the last day of the left segment;
    * single-point segments fit exactly (SSE 0, null slope).
    *
    * Scale: identical to [[autocorrelation]]'s — one census to day
    * cells, windows over the bounded spine. */
  def trendBreak(events: DataFrame, tsCol: String,
                 typeCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val mind = days.agg(min(col("day")).as("mind"))
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .crossJoin(broadcast(mind))
      .select(col("etype"), col("day"), (col("day") - col("mind")).as("x"),
        coalesce(col("n"), lit(0L)).as("y"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("etype")).orderBy(col("x"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val pre = full
      .withColumn("cn", sum(lit(1L)).over(w))
      .withColumn("csx", sum(col("x")).over(w))
      .withColumn("csy", sum(col("y")).over(w))
      .withColumn("csxx", sum(col("x") * col("x")).over(w))
      .withColumn("csxy", sum(col("x") * col("y")).over(w))
      .withColumn("csyy", sum(col("y") * col("y")).over(w))
    val tot = full.groupBy("etype").agg(count(lit(1)).as("tn"),
      sum(col("x")).as("tsx"), sum(col("y")).as("tsy"),
      sum(col("x") * col("x")).as("tsxx"),
      sum(col("x") * col("y")).as("tsxy"),
      sum(col("y") * col("y")).as("tsyy"))
    def sse(n: Column, sx: Column, sy: Column, sxx: Column, sxy: Column,
            syy: Column): Column = {
      val dxx = n * sxx - sx * sx
      val dyy = n * syy - sy * sy
      val dxy = n * sxy - sx * sy
      when(n <= 1L || dxx === 0L, lit(0.0))
        .otherwise((dyy.cast("double") * dxx - dxy.cast("double") * dxy)
          / (n.cast("double") * dxx))
    }
    def slope6(n: Column, sx: Column, sy: Column, sxx: Column,
               sxy: Column): Column = {
      val dxx = n * sxx - sx * sx
      when(n <= 1L || dxx === 0L, lit(null).cast("long"))
        .otherwise(round(lit(1e6) * (n * sxy - sx * sy).cast("double")
          / dxx.cast("double")).cast("long"))
    }
    val rn = col("tn") - col("cn")
    val rsx = col("tsx") - col("csx")
    val rsy = col("tsy") - col("csy")
    val rsxx = col("tsxx") - col("csxx")
    val rsxy = col("tsxy") - col("csxy")
    val rsyy = col("tsyy") - col("csyy")
    val gain = sse(col("tn"), col("tsx"), col("tsy"), col("tsxx"),
        col("tsxy"), col("tsyy")) -
      sse(col("cn"), col("csx"), col("csy"), col("csxx"), col("csxy"),
        col("csyy")) -
      sse(rn, rsx, rsy, rsxx, rsxy, rsyy)
    pre.join(broadcast(tot), "etype")
      .where(col("cn") < col("tn")) // both segments nonempty
      .withColumn("gain4", round(lit(1e4) * gain).cast("long"))
      .withColumn("sl", slope6(col("cn"), col("csx"), col("csy"),
        col("csxx"), col("csxy")))
      .withColumn("sr", slope6(rn, rsx, rsy, rsxx, rsxy))
      .groupBy(col("etype"))
      .agg(min(struct((-col("gain4")).as("ng"), col("day"), col("cn"),
        (col("tn") - col("cn")).as("rn"), col("sl"), col("sr"))).as("b"))
      .select(col("etype"), col("b.day").as("break_day"),
        col("b.cn").as("n_left"), col("b.rn").as("n_right"),
        (-col("b.ng")).as("gain4"), col("b.sl").as("slope_l6"),
        col("b.sr").as("slope_r6"))
  }

  /** Theil–Sen robust slope of the daily count series per event type —
    * the median of all pairwise slopes (y_j−y_i)/(x_j−x_i), immune to
    * the outlier days that drag [[graft.operators.Profiling.groupLinFit]]'s
    * least squares around (breakdown point ~29%). Pairs are generated
    * from the DAY-SPINE cells (T·(T−1)/2 per type — span-bounded, never
    * row-bounded); the median is the explicit LOWER-median convention
    * on the slope's 1e-6 grid (smallest grid slope with 2·rank ≥ n —
    * the q164 median discipline, no interpolation ambiguity). Returns
    * (etype, n_pairs, ts_slope6).
    *
    * The slope grid value is one double division of two exact integers
    * (deterministic in any IEEE engine); ordering happens on the grid,
    * so engines can't disagree on which pair is the median. */
  def theilSenSlope(events: DataFrame, tsCol: String,
                    typeCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"), coalesce(col("n"), lit(0L)).as("y"))
    val pairs = full.select(col("etype"), col("day").as("d1"),
        col("y").as("y1"))
      .join(full.select(col("etype"), col("day").as("d2"),
        col("y").as("y2")), Seq("etype"))
      .where(col("d1") < col("d2"))
      .select(col("etype"),
        round(lit(1e6) * (col("y2") - col("y1")).cast("double")
          / (col("d2") - col("d1")).cast("double")).cast("long").as("s6"))
    val cells = pairs.groupBy("etype", "s6").agg(count(lit(1)).as("m"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("etype")).orderBy(col("s6"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val tot = cells.groupBy("etype").agg(sum(col("m")).as("np"))
    cells.withColumn("cum", sum(col("m")).over(w))
      .join(broadcast(tot), "etype")
      .where(lit(2L) * col("cum") >= col("np")
        && lit(2L) * (col("cum") - col("m")) < col("np"))
      .select(col("etype"), col("np").as("n_pairs"),
        col("s6").as("ts_slope6"))
  }

  /** Per-user journey log-probability under the corpus's own bigram
    * transition model — the behavioral analog of unigram-LM document
    * scoring (q73): train add-one-smoothed transition probabilities
    * from [[transitionCounts]], then score every user's sequence;
    * users with very low mean log-prob follow paths the corpus has
    * barely seen (bot / scraper / broken-client signal). Per-edge
    * log-probs snap to the 1e-4 grid as integers (the NB/BM25 part
    * idiom), per-user sums are order-free, and the LM is a
    * |types|²-cell broadcast. Returns
    * (user_id, n_transitions, mean_lp4). */
  def journeyLogProb(events: DataFrame, userCol: String, tsCol: String,
                     orderCol: String, typeCol: String): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    val tr = events
      .select(col(userCol).as("user_id"), col(typeCol).as("f"),
        lead(col(typeCol), 1).over(w).as("t"))
      .where(col("t").isNotNull)
    val tc = tr.groupBy("f", "t").agg(count(lit(1)).as("n"))
    val ft = tc.groupBy("f").agg(sum(col("n")).as("tf"))
    val v = events.agg(countDistinct(col(typeCol)).as("v"))
    val lm = tc.join(ft, "f").crossJoin(broadcast(v))
      .withColumn("lp4", round(lit(1e4)
        * log((col("n") + lit(1L)).cast("double") / (col("tf") + col("v"))))
        .cast("long"))
      .select("f", "t", "lp4")
    tr.join(broadcast(lm), Seq("f", "t"))
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_transitions"),
        round(avg(col("lp4"))).cast("long").as("mean_lp4"))
  }

  /** Daily growth accounting — the standard active-user decomposition:
    * every (user, active-day) is NEW (first day ever), RETAINED
    * (also active the previous calendar day), or RESURRECTED (seen
    * before, but not yesterday); CHURNED(d) = active(d−1) −
    * retained(d) — the identity every growth dashboard balances.
    * One user-keyed lag over each user's distinct active days, one
    * per-day roll-up, one lag over the (bounded) day spine; churn is
    * null after a globally silent day (undefined without a
    * yesterday). Returns (day, n_active, n_new, n_retained,
    * n_resurrected, n_churned). */
  def growthAccounting(events: DataFrame, userCol: String,
                       tsCol: String): DataFrame = {
    val du = events.select(col(userCol).as("u"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("day")).distinct()
    val wu = Window.partitionBy(col("u")).orderBy(col("day"))
    val tagged = du.withColumn("prev", lag(col("day"), 1).over(wu))
      .withColumn("cls", when(col("prev").isNull, "new")
        .when(col("prev") === col("day") - 1, "retained")
        .otherwise("resurrected"))
    val daily = tagged.groupBy("day")
      .agg(count(lit(1)).as("n_active"),
        sum(when(col("cls") === "new", 1L).otherwise(0L)).as("n_new"),
        sum(when(col("cls") === "retained", 1L).otherwise(0L))
          .as("n_retained"),
        sum(when(col("cls") === "resurrected", 1L).otherwise(0L))
          .as("n_resurrected"))
    val wd = Window.orderBy(col("day")) // day-spine cells, bounded
    daily
      .withColumn("prev_day", lag(col("day"), 1).over(wd))
      .withColumn("prev_active", lag(col("n_active"), 1).over(wd))
      .withColumn("n_churned",
        when(col("prev_day") === col("day") - 1,
          col("prev_active") - col("n_retained"))
          .otherwise(lit(null).cast("long")))
      .drop("prev_day", "prev_active")
  }

  /** Rolling w-day distinct reach (WAU-style) + same-day actives (DAU)
    * + the DAU/WAU stickiness ratio per day — the engagement triple
    * every product dashboard leads with. Rolling DISTINCT does not
    * decompose into window sums, so it is computed exactly by
    * contribution explode: each distinct (user, day) activity row
    * feeds the w report days it is visible from, then one dedup +
    * count per report day — w× the (user, day) frame, never raw
    * events, never a quadratic join. Report days are the observed
    * day spine. Returns (day, dau, reach, stickiness4). */
  def rollingReach(events: DataFrame, userCol: String, tsCol: String,
                   windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be positive")
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val du = events.select(day.as("day"), col(userCol).as("u")).distinct()
    val days = events.select(day.as("wday")).distinct()
    val offs = events.sparkSession.range(0, windowDays)
      .select(col("id").as("o"))
    val contrib = du.crossJoin(broadcast(offs))
      .withColumn("wday", col("day") + col("o"))
      .join(days, "wday")
      .select("wday", "u").distinct()
    val wau = contrib.groupBy("wday").agg(count(lit(1)).as("reach"))
    val dau = du.groupBy(col("day").as("wday"))
      .agg(count(lit(1)).as("dau"))
    wau.join(dau, "wday")
      .select(col("wday").as("day"), col("dau"), col("reach"),
        round(lit(1e4) * col("dau") / col("reach")).cast("long")
          .as("stickiness4"))
  }

  /** Per-user behavioral entropy: Shannon entropy of each user's
    * event-type distribution — 0 for a one-note user, ln(|types|) for
    * a uniform one; the routine-vs-explorer signal a personalization
    * or bot-detection pass reads. Per-(user, type) contributions
    * −p·ln p are rounded to the 1e-4 nat grid as integers BEFORE the
    * per-user sum (the NB/BM25 part idiom). Cells are bounded by
    * |types| per user; one census aggregate, one user-keyed roll-up.
    * Returns (user_id, n_events, n_types, entropy4). */
  def userEntropy(events: DataFrame, userCol: String,
                  typeCol: String): DataFrame = {
    val cells = events.groupBy(col(userCol).as("user_id"),
        col(typeCol).as("etype"))
      .agg(count(lit(1)).as("n"))
    val tot = cells.groupBy("user_id")
      .agg(sum(col("n")).as("t"), count(lit(1)).as("n_types"))
    cells.join(tot, "user_id")
      .withColumn("part4",
        round(lit(-1e4) * (col("n").cast("double") / col("t"))
          * log(col("n").cast("double") / col("t"))).cast("long"))
      .groupBy(col("user_id"), col("t"), col("n_types"))
      .agg(sum(col("part4")).as("entropy4"))
      .select(col("user_id"), col("t").as("n_events"), col("n_types"),
        col("entropy4"))
  }

  /** Feed-health dispersion census per event type over the zero-filled
    * day spine: Fano factor (variance/mean of daily counts — 1.0 is
    * Poisson, higher is bursty), peak-to-mean ratio, and the fraction
    * of silent days — the three numbers an ingest dashboard reads
    * before trusting a feed's volume. All three are single divisions
    * of exact integers onto the 1e-4 grid
    * (Fano = (T·Σn² − (Σn)²) / (T·Σn) with population variance).
    * Returns (etype, n_days, total, fano4, peak_ratio4, zero_frac4).
    * One census aggregate; nothing leaves the spine. */
  def dispersionCensus(events: DataFrame, tsCol: String,
                       typeCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), coalesce(col("n"), lit(0L)).as("n"))
      .groupBy("etype")
      .agg(count(lit(1)).as("t"), sum(col("n")).as("s"),
        sum(col("n") * col("n")).as("qq"), max(col("n")).as("mx"),
        sum(when(col("n") === 0L, 1L).otherwise(0L)).as("zs"))
      .where(col("s") > 0L)
      .select(col("etype"), col("t").as("n_days"), col("s").as("total"),
        round(lit(1e4) * (col("t") * col("qq") - col("s") * col("s"))
          .cast("double") / (col("t") * col("s")).cast("double"))
          .cast("long").as("fano4"),
        round(lit(1e4) * (col("mx") * col("t")).cast("double")
          / col("s").cast("double")).cast("long").as("peak_ratio4"),
        round(lit(1e4) * col("zs") / col("t")).cast("long").as("zero_frac4"))
  }

  /** Day-of-week seasonality profile per event type — the multiplicative
    * seasonal index a volume forecast or anomaly detector divides out
    * before comparing days: for each (type, weekday) the mean daily
    * count over the zero-filled day spine, expressed relative to the
    * type's overall mean daily count,
    * `index4 = ⌊10⁴·(s_d/t_d)/(S/T)⌉ = round(10⁴·s_d·T/(t_d·S))` —
    * exact integer products into one grid division. 10⁴ = flat;
    * a weekday reading 14 000 carries 1.4× its type's average volume.
    * `share4` is the weekday's fraction of total volume. Weekday is
    * the engine-neutral epoch-day mod 7 (0 = Thursday, since epoch day
    * 0 was a Thursday) — no calendar/locale dependency to disagree on.
    *
    * Scale: one (type, day) census, a type×7 aggregate — nothing
    * bigger than the day spine ever shuffles. */
  def dowSeasonality(events: DataFrame, tsCol: String,
                     typeCol: String): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), pmod(col("day"), lit(7L)).as("dow"),
        coalesce(col("n"), lit(0L)).as("n"))
    val byDow = full.groupBy("etype", "dow")
      .agg(count(lit(1)).as("n_days"), sum(col("n")).as("s"))
    val tot = byDow.groupBy("etype")
      .agg(sum(col("n_days")).as("t"), sum(col("s")).as("tot"))
    byDow.join(tot, "etype")
      .where(col("tot") > 0L)
      .select(col("etype"), col("dow").cast("int").as("dow"),
        col("n_days"), col("s").as("total"),
        round(lit(1e4) * (col("s") * col("t")).cast("double")
          / (col("n_days") * col("tot")).cast("double")).cast("long")
          .as("index4"),
        round(lit(1e4) * col("s") / col("tot")).cast("long").as("share4"))
  }

  /** One-sided CUSUM change-point statistic per event type — the
    * sequential burst detector beside [[ewmaBaseline]]'s smoother:
    * over the same full day spine,
    * `C_t = max(0, C_{t−1} + (n_t·10⁴ − target4 − slack4))`
    * accumulates only sustained upward deviation (the slack absorbs
    * noise; a single spike decays, a level shift ramps). `target4`
    * defaults to the series' own mean (⌊Σn·10⁴ / days⌋ — exact
    * integer), the standard self-baselined form. Output per type:
    * final C, its max over the horizon, and the first day the max was
    * reached — the change-point estimate. Same engine-parity shape as
    * the EWMA: a higher-order fold over the bounded day array with
    * integer arithmetic at every step. */
  def cusum(events: DataFrame, tsCol: String, typeCol: String,
            slack4: Long = 5000L): DataFrame = {
    val day = floor(unix_timestamp(col(tsCol)) / 86400L)
    val counts = events.select(col(typeCol).as("etype"), day.as("day"))
      .groupBy("etype", "day").agg(count(lit(1)).as("n"))
    val days = events.select(day.as("day")).distinct()
    val types = events.select(col(typeCol).as("etype")).distinct()
    val full = types.crossJoin(days)
      .join(counts, Seq("etype", "day"), "left")
      .select(col("etype"), col("day"),
        coalesce(col("n"), lit(0L)).as("n"))
    val arrs = full.groupBy("etype")
      .agg(array_sort(collect_list(struct(col("day"), col("n")))).as("arr"),
        count(lit(1)).as("n_days"), sum(col("n")).as("total"))
      .withColumn("target4",
        floor(col("total") * 10000L / col("n_days")).cast("long"))
    // fold state encoded as ONE struct (c, mx, mx_day): integer
    // arithmetic at every step so any engine replays it bit-exactly
    val zero = struct(lit(0L).as("c"), lit(-1L).as("mx"),
      lit(-1L).as("mx_day"))
    arrs.select(col("etype"), col("n_days"), col("target4"),
        aggregate(col("arr"), zero, (acc, x) => {
          val c = greatest(lit(0L),
            acc.getField("c") + x.getField("n") * 10000L
              - col("target4") - lit(slack4))
          val better = c > acc.getField("mx")
          struct(c.as("c"),
            when(better, c).otherwise(acc.getField("mx")).as("mx"),
            when(better, x.getField("day")).otherwise(acc.getField("mx_day"))
              .as("mx_day"))
        }).as("st"))
      .select(col("etype"), col("n_days"), col("target4"),
        col("st.c").as("final_c4"), col("st.mx").as("max_c4"),
        col("st.mx_day").as("max_day"))
  }

  /** Longest consecutive-day activity streak per user (gaps and
    * islands): distinct active days, islands found by the classic
    * `day − row_number` constant-group trick — one user-keyed window
    * + one keyed aggregate, no self-join, no recursion. Output per
    * user: days active, longest streak, and the streak's start day
    * (earliest if tied). */
  def activityStreaks(events: DataFrame, userCol: String,
                      tsCol: String): DataFrame = {
    val days = events.select(col(userCol).as("uid"),
        floor(unix_timestamp(col(tsCol)) / 86400L).as("day"))
      .distinct()
    val w = Window.partitionBy(col("uid")).orderBy(col("day"))
    val islands = days
      .withColumn("grp", col("day") - row_number().over(w))
      .groupBy("uid", "grp")
      .agg(count(lit(1)).as("len"), min(col("day")).as("start_day"))
    islands.groupBy("uid")
      .agg(sum(col("len")).as("n_active_days"),
        max(col("len")).as("longest_streak"),
        // earliest start among maximal streaks via ONE scalar arg-min
        // key (longer streak → smaller key; tie → earlier day) — no
        // struct-comparison semantics to match across engines
        min_by(col("start_day"),
          (lit(100000L) - col("len")) * 10000000L + col("start_day"))
          .as("streak_start"))
  }

  /** Exact audience-overlap matrix: for every unordered pair of event
    * types, the distinct-user overlap |A∩B| and its Jaccard on the
    * grid — which behaviors share an audience. Same inverted shape as
    * [[basketLift]] but at the USER level with distinct semantics:
    * one (user, type) dedup shuffle, a per-user self-join bounded by
    * |types|², a ≤ |types|²-cell census. (The mergeable-sketch
    * variant for 10¹⁰ users is the HLL store + inclusion–exclusion —
    * this is the exact face.) */
  def audienceOverlap(events: DataFrame, userCol: String,
                      typeCol: String): DataFrame = {
    val m = events.select(col(userCol).as("uid"), col(typeCol).as("item"))
      .distinct()
    val sizes = m.groupBy("item").agg(count(lit(1)).as("n_i"))
    m.select(col("uid"), col("item").as("item_a"))
      .join(m.select(col("uid"), col("item").as("item_b")), "uid")
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_both"))
      .join(sizes.select(col("item").as("item_a"),
        col("n_i").as("n_a")), "item_a")
      .join(sizes.select(col("item").as("item_b"),
        col("n_i").as("n_b")), "item_b")
      .select(col("item_a"), col("item_b"), col("n_both"),
        col("n_a"), col("n_b"),
        round(lit(1e4) * col("n_both")
          / (col("n_a") + col("n_b") - col("n_both")))
          .cast("long").as("jaccard4"))
  }

  /** Market-basket co-occurrence lift: baskets are (user, time
    * bucket); items are the DISTINCT event types in a basket; for
    * every unordered type pair — basket counts and
    * `lift = P(ab) / (P(a)·P(b))` on the 1e-4 grid (assembled as one
    * ratio of exact integer counts, the PMI idiom). Lift > 1 means
    * the pair co-occurs beyond independence — the cross-feature
    * signal [[transitionCounts]]' ordering census can't give.
    * Shapes: basket-distinct items (one dedup shuffle), a
    * within-basket self-join whose fan-out is bounded by |types|², a
    * ≤ |types|²-cell census, broadcast totals. */
  def basketLift(events: DataFrame, userCol: String, tsCol: String,
                 typeCol: String, bucketSeconds: Long = 86400L): DataFrame = {
    val items = events.select(col(userCol).as("uid"),
        floor(unix_timestamp(col(tsCol)) / bucketSeconds).as("bkt"),
        col(typeCol).as("item"))
      .distinct()
    val nBaskets = items.select("uid", "bkt").distinct()
      .agg(count(lit(1)).as("t_b"))
    val itemCounts = items.groupBy("item").agg(count(lit(1)).as("n_i"))
    val pairs = items.select(col("uid"), col("bkt"), col("item").as("item_a"))
      .join(items.select(col("uid"), col("bkt"), col("item").as("item_b")),
        Seq("uid", "bkt"))
      .where(col("item_a") < col("item_b"))
      .groupBy("item_a", "item_b").agg(count(lit(1)).as("n_ab"))
    pairs
      .join(itemCounts.select(col("item").as("item_a"),
        col("n_i").as("n_a")), "item_a")
      .join(itemCounts.select(col("item").as("item_b"),
        col("n_i").as("n_b")), "item_b")
      .crossJoin(broadcast(nBaskets))
      .select(col("item_a"), col("item_b"), col("n_ab"),
        col("n_a"), col("n_b"),
        round(lit(1e4) * col("n_ab") * col("t_b")
          / (col("n_a") * col("n_b"))).cast("long").as("lift4"))
  }

  /** Seasonal traffic census: event counts per (day-of-week, UTC
    * hour) cell with share and lift against a uniform week — the
    * 7×24 heatmap behind capacity planning and anomaly baselines.
    * Day-of-week comes from pure epoch arithmetic
    * (`(epoch_day + 4) mod 7`, 0 = Sunday) rather than an engine
    * calendar function — DuckDB and Spark disagree on dow numbering
    * conventions, integer arithmetic they cannot. One
    * word-count-shaped aggregate over ≤ 168 cells. */
  def seasonalCensus(events: DataFrame, tsCol: String): DataFrame = {
    val ep = unix_timestamp(col(tsCol))
    val cells = events
      .select(pmod(floor(ep / 86400L) + 4L, lit(7L)).as("dow"),
        pmod(floor(ep / 3600L), lit(24L)).as("hour"))
      .groupBy("dow", "hour").agg(count(lit(1)).as("n"))
    cells.crossJoin(broadcast(events.agg(count(lit(1)).as("t"))))
      .select(col("dow"), col("hour"), col("n"),
        round(lit(1e4) * col("n") / col("t")).cast("long").as("share4"),
        round(lit(1e4) * col("n") * 168L / col("t")).cast("long").as("lift4"))
  }

  /** Top-k user-journey prefixes: each user's first `maxLen` event
    * types in (ts, tie id) order joined into a path string
    * (`view>click>purchase`), counted across users — the
    * beyond-first-order census [[transitionCounts]] can't give (it
    * sees pairs; this sees whole openings). Deterministic rank:
    * count DESC, path ASC.
    *
    * Scale shape: a per-user window row_number caps each user's
    * contribution at `maxLen` rows BEFORE the collect, so the
    * aggregate payload is maxLen×|users| regardless of history depth;
    * the path census is word-count-shaped (≤ |types|^maxLen cells,
    * far fewer in practice); TakeOrdered k. */
  def topPaths(events: DataFrame, userCol: String, tsCol: String,
               orderCol: String, typeCol: String,
               maxLen: Int, k: Int): DataFrame = {
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsCol), col(orderCol))
    events
      .select(col(userCol).as("uid"), col(typeCol).as("etype"),
        row_number().over(w).as("rn"))
      .where(col("rn") <= maxLen)
      .groupBy("uid")
      .agg(concat_ws(">",
        transform(array_sort(collect_list(struct(col("rn"), col("etype")))),
          x => x.getField("etype"))).as("path"))
      .groupBy("path").agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(k)
  }

  /** First-touch / last-touch conversion attribution: every `convType`
    * event is credited to the earliest (first-touch model) and latest
    * (last-touch model) `touchTypes` event by the SAME user in the
    * lookback window `[t − lookbackSec, t)` — strictly before the
    * conversion; a conversion with no touch in window lands in the
    * `(none)` bucket. Output: one row per (model, touch_type) with the
    * conversion count and the 1e-2-grid value sum.
    *
    * Shape: NO conversion×touch join — both models ride ONE
    * user-keyed pass as running min/max over a micro-second RANGE
    * frame (the frame bound enforces the lookback exactly). The touch
    * candidate is encoded `micros · K + typeIdx` (K = |touchTypes|+1)
    * so min/max carry the type along; within one microsecond the
    * type index breaks ties deterministically (first-touch prefers
    * the earlier-listed type, last-touch the later-listed — replayed
    * verbatim by the oracle). */
  def touchAttribution(events: DataFrame, userCol: String, tsCol: String,
                       typeCol: String, valueCol: String,
                       touchTypes: Seq[String], convType: String,
                       lookbackSec: Long): DataFrame = {
    require(touchTypes.nonEmpty, "need at least one touch type")
    val k = touchTypes.size + 1
    val m = unix_micros(col(tsCol))
    val enc = touchTypes.zipWithIndex.foldLeft(lit(null).cast("long")) {
      case (acc, (t, i)) =>
        when(col(typeCol) === t, m * k + (i + 1)).otherwise(acc)
    }
    val w = Window.partitionBy(col(userCol)).orderBy(col("m"))
      .rangeBetween(-lookbackSec * 1000000L, -1L)
    val scanned = events
      .select(col(userCol), m.as("m"), col(typeCol).as("etype"),
        round(col(valueCol) * 100).cast("long").as("v2"), enc.as("te"))
      .withColumn("fe", min(col("te")).over(w))
      .withColumn("le", max(col("te")).over(w))
      .where(col("etype") === convType)
    def decode(encCol: Column): Column =
      touchTypes.zipWithIndex.foldLeft(lit("(none)")) {
        case (acc, (t, i)) =>
          when(pmod(encCol, lit(k.toLong)) === (i + 1), t).otherwise(acc)
      }
    def model(name: String, encCol: Column): DataFrame =
      scanned.groupBy(decode(encCol).as("touch_type"))
        .agg(count(lit(1)).as("n_conv"), sum(col("v2")).as("sum_value2"))
        .select(lit(name).as("model"), col("touch_type"),
          col("n_conv"), col("sum_value2"))
    model("first", col("fe")).unionAll(model("last", col("le")))
  }

  /** Maximum drawdown of an integer-valued series: the largest drop
    * from a running peak — the risk readout every monitoring dashboard
    * wants for a daily metric ("worst decline from the best day so
    * far"). Input: one row per `ordCol` step with an exact integer
    * `valCol` (put floats on a grid first). Returns ONE row:
    * (max_dd, dd_ord, peak_before) — the deepest drawdown, the first
    * step it bottomed at (ord tie-break), and the peak it fell from.
    * A non-decreasing series reports max_dd = 0 at the first step.
    *
    * Scale: one running-max window over the series spine (series are
    * time-grain-sized — days/hours — never event-sized; aggregate to
    * the grain first) + one order-by-(dd desc) top-1. */
  def maxDrawdown(series: DataFrame, ordCol: String,
                  valCol: String): DataFrame = {
    val w = Window.orderBy(col("ord"))
      .rowsBetween(Window.unboundedPreceding, 0)
    series
      .select(col(ordCol).as("ord"), col(valCol).as("v"))
      .withColumn("peak", max(col("v")).over(w))
      .select(col("ord"), (col("peak") - col("v")).as("dd"), col("peak"))
      .orderBy(col("dd").desc, col("ord"))
      .limit(1)
      .select(col("dd").as("max_dd"), col("ord").as("dd_ord"),
        col("peak").as("peak_before"))
  }

  /** Per-user ordered event-initial k-gram census — the frequent-
    * subsequence miner's contiguous core (what users DO in windows of
    * k actions, with support = how many distinct users exhibit the
    * pattern at least once). Builds each user's event-initial string
    * ONCE (the [[sequencePatternCensus]] spine), slides a k-window
    * over it, and counts (occurrences, distinct users) per k-gram.
    * Scale: the per-user string is that user's event count (bounded
    * by the session/user grain); the explode is k-gram-count-sized;
    * the census shuffles on the k-gram key only. */
  def eventKgrams(events: DataFrame, userCol: String, tsCol: String,
                  idCol: String, typeCol: String, k: Int): DataFrame = {
    require(k >= 2, "k must be >= 2")
    val seqs = events
      .withColumn("__i", substring(col(typeCol), 1, 1))
      .groupBy(col(userCol).as("user"))
      .agg(concat_ws("", array_sort(collect_list(struct(
        col(tsCol).as("ts"), col(idCol).as("id"), col("__i"))))
        .getField("__i")).as("seq"))
    // guard BEFORE sequence(): Spark's sequence(1, 0) descends instead
    // of being empty, so a too-short string must never reach it
    seqs.where(length(col("seq")) >= k)
      .select(col("user"), explode(expr(
        s"transform(sequence(1, length(seq) - ${k - 1}), " +
          s"i -> substring(seq, i, $k))")).as("gram"))
      .groupBy(col("gram"))
      .agg(count(lit(1)).as("n_occurrences"),
        countDistinct(col("user")).as("n_users"))
  }

  /** Rolling k-day DISTINCT user count (k-day active users per day) —
    * the metric window functions cannot express (COUNT(DISTINCT) over
    * a moving frame is unsupported in every engine's window clause)
    * and sketches only approximate. Exact set semantics via coverage
    * explosion: a user active on day d is "covered" by the k windows
    * ending on d..d+k−1, so distinct (user, window) pairs counted per
    * window ARE the rolling distinct counts. Cost: active (user, day)
    * pairs × k rows — day-grain × k, independent of raw event volume;
    * the shuffle keys on the window day. Windows beyond the data span
    * are dropped. Returns (day, n_users). */
  def rollingDistinctUsers(events: DataFrame, userCol: String,
                           tsCol: String, windowDays: Int = 7): DataFrame = {
    require(windowDays >= 1, "windowDays must be >= 1")
    val act = events.select(col(userCol).as("user"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("d")).distinct()
    val span = act.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    act
      .select(col("user"),
        explode(sequence(col("d"), col("d") + (windowDays - 1))).as("w"))
      .distinct()
      .crossJoin(broadcast(span))
      .where(col("w") <= col("d1"))
      .groupBy(col("w").as("day"))
      .agg(count(lit(1)).as("n_users"))
  }

  /** Holt–Winters ADDITIVE seasonal forecast of daily counts per group
    * — the level+trend+season completion of [[holtForecast]], on the
    * same exact 1e-4 integer grid with floor-division round-half-up
    * (α = 0.3, β = 0.2, γ = 0.3; period m):
    *   l_t = ⌊(3(y_t − s_{t−m}) + 7(l+b) + 5)/10⌋,
    *   b_t = ⌊(2(l_t − l) + 8b + 5)/10⌋,
    *   s_t = ⌊(3(y_t − l_t) + 7s_{t−m} + 5)/10⌋.
    * Init: l = round-half-up mean of the first period, b = 0,
    * s_i = y_i − l over that period; groups with fewer than m+1 days
    * on the spine emit nothing. Forecast h ∈ 1..m:
    * l + h·b + s_{T−m+h−1}. Like [[holtForecast]], the fold runs on
    * collected day-grain model state (groups × day span — bounded);
    * a SQL oracle replays every step as a recursive walk carrying the
    * rotating m-seasonal queue, so a hash match proves the fold
    * equals the sequential recurrence, negative residuals included.
    * Returns (grp, h, level4, trend4, season4, forecast4). */
  def holtWintersForecast(events: DataFrame, tsCol: String,
                          typeCol: String, period: Int = 7): DataFrame = {
    require(period >= 2, "period must be >= 2")
    val spark = events.sparkSession
    import spark.implicits._
    val days = events.select(col(typeCol).as("grp"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("d"))
    val span = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = days.select(col("grp")).distinct()
      .crossJoin(broadcast(span))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine
      .join(days.groupBy("grp", "d").agg(count(lit(1)).as("y")),
        Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
      .orderBy("grp", "d")
      .collect()  // groups × day span — bounded model state
      .groupBy(_.getString(0))
    def fdiv(a: BigInt, b: BigInt): BigInt = {
      val q = a / b
      if (a % b != 0 && a.signum != b.signum) q - 1 else q
    }
    val m = period
    val out = series.toSeq.sortBy(_._1).flatMap { case (g, rows) =>
      val ys = rows.sortBy(_.getLong(1)).map(r => BigInt(r.getLong(2) * 10000L))
      if (ys.length < m + 1) Seq.empty
      else {
        var l = fdiv(2 * ys.take(m).sum + m, 2 * m)
        var b = BigInt(0)
        val s = scala.collection.mutable.Queue(
          ys.take(m).map(_ - l).toSeq: _*)
        ys.drop(m).foreach { y =>
          val sOld = s.dequeue()
          val l2 = fdiv(3 * (y - sOld) + 7 * (l + b) + 5, 10)
          b = fdiv(2 * (l2 - l) + 8 * b + 5, 10)
          l = l2
          s.enqueue(fdiv(3 * (y - l2) + 7 * sOld + 5, 10))
        }
        val sv = s.toIndexedSeq
        (1 to m).map(h => (g, h.toLong, l.toLong, b.toLong,
          sv(h - 1).toLong, (l + h * b + sv(h - 1)).toLong))
      }
    }
    out.toDF("grp", "h", "level4", "trend4", "season4", "forecast4")
  }

  /** Seasonal-naive anomaly census: daily counts per group on a
    * zero-filled spine, residual r = y(d) − y(d − period) (the
    * same-weekday-last-week baseline that absorbs weekly shape where
    * [[hampelFilter]]'s ±3-day window would flag every weekend), and a
    * day is anomalous when |r| exceeds 3× the group's MAD — median
    * absolute residual, computed exactly as a ×2 integer
    * ([[Profiling.exactMedian2]]), so the flag is `2|r| > 3·mad2` in
    * pure integers. Returns per group: (grp, n_res, mad2,
    * n_anomalies, worst_dev, worst_day) — worst_day is the earliest
    * day attaining the worst deviation. Spine + lag window + one
    * rank-median per group; series are day-grain, never event-grain.
    * Pins the residual frame for the session; long-running sessions
    * should use [[seasonalMadAnomaliesManaged]] and release it once
    * the output is materialized. */
  def seasonalMadAnomalies(events: DataFrame, grpCol: String,
                           tsCol: String, period: Int = 7): DataFrame =
    seasonalMadAnomaliesManaged(events, grpCol, tsCol, period)._1

  /** [[seasonalMadAnomalies]] with an explicit cache lifecycle (the
    * [[graft.operators.Dedup.editDistancePairsManaged]] convention):
    * the day-grain residual frame feeds three aggregates and is
    * persisted — the returned `release` thunk drops it once the
    * census is consumed. */
  def seasonalMadAnomaliesManaged(events: DataFrame, grpCol: String,
                                  tsCol: String, period: Int = 7)
      : (DataFrame, () => Unit) = {
    require(period >= 1, "period must be >= 1")
    val days = events.select(col(grpCol).as("grp"),
      floor(unix_timestamp(col(tsCol)) / 86400L).as("d"))
    val span = days.agg(min(col("d")).as("d0"), max(col("d")).as("d1"))
    val spine = days.select(col("grp")).distinct()
      .crossJoin(broadcast(span))
      .select(col("grp"), explode(sequence(col("d0"), col("d1"))).as("d"))
    val series = spine
      .join(days.groupBy("grp", "d").agg(count(lit(1)).as("y")),
        Seq("grp", "d"), "left")
      .select(col("grp"), col("d"), coalesce(col("y"), lit(0L)).as("y"))
    val w = Window.partitionBy(col("grp")).orderBy(col("d"))
    val res = series
      .withColumn("yl", lag(col("y"), period).over(w))
      .where(col("yl").isNotNull)
      .select(col("grp"), col("d"), abs(col("y") - col("yl")).as("a"))
      .persist()
    val mad = Profiling.exactMedian2(res, "grp", "a")
      .select(col("grp"), col("median2").as("mad2"))
    val worst = res.groupBy(col("grp"))
      .agg(count(lit(1)).as("n_res"), max(col("a")).as("worst_dev"))
    val worstDay = res.join(worst, Seq("grp"))
      .where(col("a") === col("worst_dev"))
      .groupBy(col("grp")).agg(min(col("d")).as("worst_day"))
    val out = res.join(mad, Seq("grp"))
      .groupBy(col("grp"))
      .agg(max(col("mad2")).as("mad2"),
        sum(when(lit(2) * col("a") > lit(3) * col("mad2"), 1L)
          .otherwise(0L)).as("n_anomalies"))
      .join(worst, Seq("grp")).join(worstDay, Seq("grp"))
      .select(col("grp"), col("n_res"), col("mad2"),
        col("n_anomalies"), col("worst_dev"), col("worst_day"))
    (out, () => { res.unpersist(blocking = false); () })
  }

  /** Windowed conversion: for every `typeA` event, did a `typeB` event
    * by the SAME user follow within `windowMicros` (exclusive start,
    * inclusive end)? The attribution primitive "views that converted
    * within the hour" — stricter than the ordered funnel (which has no
    * deadline) and looser than adjacency. Returns per user:
    * (user, n_a, n_converted). Scale: one semi-join of the user's A
    * events against their B events keyed on the user — per-user
    * candidate pairs, never cross-user. */
  def windowedConversion(events: DataFrame, userCol: String,
                         tsCol: String, typeCol: String,
                         typeA: String, typeB: String,
                         windowMicros: Long): DataFrame = {
    val a = events.where(col(typeCol) === typeA)
      .select(col(userCol).as("user"), unix_micros(col(tsCol)).as("ta"))
    val b = events.where(col(typeCol) === typeB)
      .select(col(userCol).as("user"), unix_micros(col(tsCol)).as("tb"))
    val conv = a.join(b,
        a("user") === b("user") && col("tb") > col("ta") &&
          col("tb") <= col("ta") + windowMicros,
        "left_semi")
      .groupBy(col("user")).agg(count(lit(1)).as("n_converted"))
    a.groupBy(col("user")).agg(count(lit(1)).as("n_a"))
      .join(conv, Seq("user"), "left")
      .select(col("user"), col("n_a"),
        coalesce(col("n_converted"), lit(0L)).as("n_converted"))
  }

  /** Throttle-style event dedup (tolerance dedup): per key, keep the
    * first event and every event at least `gapMicros` after the LAST
    * KEPT one — the debounce semantics a "within Δ means duplicate
    * delivery" contract needs, which a plain lag() CANNOT express
    * (each decision depends on the previous DECISION, not the
    * previous row). The per-key recurrence runs inside one
    * `array_sort ∘ aggregate` higher-order fold (the q282
    * clamped-balance idiom — whole-stage codegen, no
    * flatMapGroups), so a SQL oracle can replay it as a per-rank
    * recursive walk. Returns per key: (n_events, n_kept,
    * last_kept_us). Per-key arrays are user-grain-sized; a mega-key
    * would switch to repartition + sortWithinPartitions. */
  def throttleDedup(events: DataFrame, keyCols: Seq[String],
                    tsCol: String, idCol: String,
                    gapMicros: Long): DataFrame = {
    require(keyCols.nonEmpty, "need at least one key column")
    events
      .select(keyCols.map(col) :+ unix_micros(col(tsCol)).as("__us")
        :+ col(idCol).as("__id"): _*)
      .groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_events"),
        array_sort(collect_list(struct(col("__us"), col("__id"))))
          .as("__evs"))
      .withColumn("__acc", expr(
        s"""aggregate(__evs,
           |  named_struct('last', CAST(-1 AS BIGINT),
           |               'n', CAST(0 AS BIGINT)),
           |  (acc, e) -> IF(acc.n = 0L OR e.__us >= acc.last + ${gapMicros}L,
           |    named_struct('last', e.__us, 'n', acc.n + 1L),
           |    acc))""".stripMargin))
      .select(keyCols.map(col) :+ col("n_events") :+
        col("__acc.n").as("n_kept") :+
        col("__acc.last").as("last_kept_us"): _*)
  }
}
