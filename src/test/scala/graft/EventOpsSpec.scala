package graft

import graft.operators.EventOps
import java.sql.Timestamp
import org.apache.spark.sql.functions._

/** Ordered-funnel and transition-census semantics, hand-computed. */
class EventOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(sec: Int) = new Timestamp(1704067200000L + sec * 1000L)

  // user 1: view(1) click(2) buy(3)  — full ordered funnel
  // user 2: click(1) view(2) buy(3)  — click BEFORE view: funnel needs a
  //                                    click after t0; none → stops at view
  // user 3: view(1) click(2)         — no purchase
  // user 4: buy(1) view(2) click(3) buy(4) — pre-view purchase ignored,
  //                                    the later one counts
  private lazy val ev = Seq(
    (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"), (3L, 1L, ts(3), "purchase"),
    (4L, 2L, ts(1), "click"), (5L, 2L, ts(2), "view"), (6L, 2L, ts(3), "purchase"),
    (7L, 3L, ts(1), "view"), (8L, 3L, ts(2), "click"),
    (9L, 4L, ts(1), "purchase"), (10L, 4L, ts(2), "view"),
    (11L, 4L, ts(3), "click"), (12L, 4L, ts(4), "purchase")
  ).toDF("event_id", "user_id", "ts", "event_type")

  test("funnel: strict ordering per user, null tail after the first miss") {
    val t = EventOps.funnelTimes(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select(col("user_id"), col("t0").isNotNull, col("t1").isNotNull,
        col("t2").isNotNull)
      .as[(Long, Boolean, Boolean, Boolean)].collect().sortBy(_._1).toSeq
    assert(t === Seq(
      (1L, true, true, true),
      (2L, true, false, false),   // no click after the first view
      (3L, true, true, false),
      (4L, true, true, true)))    // pre-view purchase ignored, later counts
    val report = EventOps.funnelReport(ev, "user_id", "ts", "event_type",
        Seq("view", "click", "purchase"))
      .select("step", "n_users").as[(Int, Long)].collect().sortBy(_._1).toSeq
    assert(report === Seq((0, 4L), (1, 3L), (2, 2L)))
  }

  test("peakConcurrency: sweep line with inclusive ends, two-phase cumulative") {
    // intervals: [0,10] [5,20] [10,30] — at t=10 all three overlap
    // (inclusive ends: the first interval still counts at its end)
    val iv = Seq((ts(0), ts(10)), (ts(5), ts(20)), (ts(10), ts(30)),
      (ts(40), ts(50))).toDF("st", "en")
    val out = EventOps.peakConcurrency(iv, "st", "en", bucketSeconds = 7L)
      .as[(Long, Timestamp)].collect().toSeq
    assert(out === Seq((3L, ts(10))))
    // disjoint intervals: peak 1 at the earliest start
    val solo = Seq((ts(0), ts(1)), (ts(5), ts(6))).toDF("st", "en")
    assert(EventOps.peakConcurrency(solo, "st", "en")
      .as[(Long, Timestamp)].collect().toSeq === Seq((1L, ts(0))))
  }

  test("transitions: per-user consecutive pairs, deterministic tie-break") {
    val t = EventOps.transitionCounts(ev, "user_id", "ts", "event_id",
        "event_type")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    // user1: v->c, c->p; user2: c->v, v->p; user3: v->c;
    // user4: p->v, v->c, c->p
    assert(t === Map(
      ("view", "click") -> 3L, ("click", "purchase") -> 2L,
      ("click", "view") -> 1L, ("view", "purchase") -> 1L,
      ("purchase", "view") -> 1L))
  }

  test("ewmaBaseline: zero-seeded integer fold over the day spine; quiet days count 0") {
    def d(day: Int, sec: Int) = ts(day * 86400 + sec)
    // type a: day0 ×4, day1 ×0 (quiet — spine supplies it), day2 ×8
    // type b: day1 ×2 only → spine gives it days 0 and 2 as zeros
    val evs = (
      (1 to 4).map(i => (i.toLong, d(0, i), "a")) ++
      (1 to 8).map(i => (i.toLong, d(2, i), "a")) ++
      (1 to 2).map(i => (i.toLong, d(1, i), "b"))
    ).toDF("event_id", "ts", "event_type")
    val out = EventOps.ewmaBaseline(evs, "ts", "event_type")
      .select("etype", "n_last", "ewma4", "dev4")
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    // a: e1=⌊40000/4⌋=10000; e2=⌊30000/4⌋=7500; e3=⌊(22500+80000)/4⌋=25625
    assert(out("a") === ((8L, 25625L, 80000L - 25625L)))
    // b: e1=0; e2=⌊20000/4⌋=5000; e3=⌊15000/4⌋=3750; last day count 0
    assert(out("b") === ((0L, 3750L, -3750L)))
  }

  test("cusum: hand-computed burst-then-decay; max and its first day recorded") {
    def d(day: Int, sec: Int) = ts(day * 86400 + sec)
    // spine = the two days WITH events (0 and 3): counts 30, 10 →
    // target4 = 400000/2 = 200000; c: max(0, 300000−205000) = 95000
    // (the max, on day 0), then max(0, 95000+100000−205000) = 0
    val evs = (
      (1 to 30).map(i => (i.toLong, d(0, i), "a")) ++
      (1 to 10).map(i => (i.toLong, d(3, i), "a"))
    ).toDF("event_id", "ts", "event_type")
    val day0 = java.lang.Math.floorDiv(
      ts(0).getTime / 1000L, 86400L)
    val out = EventOps.cusum(evs, "ts", "event_type", slack4 = 5000L)
      .select("etype", "n_days", "target4", "final_c4", "max_c4", "max_day")
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(out === (("a", 2L, 200000L, 0L, 95000L, day0)))
  }

  test("topPaths: ordered openings capped at maxLen, deterministic census") {
    val out = EventOps.topPaths(ev, "user_id", "ts", "event_id",
        "event_type", maxLen = 2, k = 10)
      .as[(String, Long)].collect().toSeq
    // users 1 & 3 open view>click; user 2 click>view; user 4 purchase>view
    assert(out === Seq(("view>click", 2L), ("click>view", 1L),
      ("purchase>view", 1L)))
  }

  test("touchAttribution: first/last models, lookback expiry, (none), same-instant tie-break") {
    // user 1: view(1) click(2) buy(3)      — first=view, last=click
    // user 2: view(1) buy(200)             — touch older than 100 s lookback → (none)
    // user 3: buy(5) with NO prior touch   — (none)
    // user 4: view & click BOTH at t=1 (same microsecond), buy(2) —
    //   tie broken by type index: first-touch prefers view (idx 1),
    //   last-touch prefers click (idx 2)
    val evA = Seq(
      (1L, ts(1), "view", 0.0), (1L, ts(2), "click", 0.0),
      (1L, ts(3), "purchase", 10.0),
      (2L, ts(1), "view", 0.0), (2L, ts(200), "purchase", 20.0),
      (3L, ts(5), "purchase", 40.0),
      (4L, ts(1), "view", 0.0), (4L, ts(1), "click", 0.0),
      (4L, ts(2), "purchase", 80.0)
    ).toDF("user_id", "ts", "event_type", "value")
    val out = EventOps.touchAttribution(evA, "user_id", "ts", "event_type",
        "value", Seq("view", "click"), "purchase", lookbackSec = 100L)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("first", "view") -> ((2L, 9000L)),    // users 1 and 4
      ("first", "(none)") -> ((2L, 6000L)),  // users 2 (expired) and 3
      ("last", "click") -> ((2L, 9000L)),    // users 1 and 4 (tie → click)
      ("last", "(none)") -> ((2L, 6000L))))
  }

  test("autocorrelation: hand-computed alternating series; constant series omitted") {
    // type 'alt' daily counts [1,3,1,3] → r1 = −3/4, r2 = 1/2, r3 = −1/4
    // type 'const' [2,2,2,2] → zero variance → no rows
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val counts = Seq(1, 3, 1, 3)
    val alt = for { (c, d) <- counts.zipWithIndex; i <- 0 until c }
      yield (d * 10L + i, 1L, dayTs(d, i), "alt")
    val const = for { d <- 0 until 4; i <- 0 until 2 }
      yield (1000L + d * 10 + i, 2L, dayTs(d, i), "const")
    val out = EventOps.autocorrelation(
        (alt ++ const).toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type", maxLag = 3)
      .select("etype", "lag", "n_pairs", "r4")
      .as[(String, Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(out === Seq(
      ("alt", 1L, 3L, -7500L), ("alt", 2L, 2L, 5000L),
      ("alt", 3L, 1L, -2500L)))
  }

  test("growthAccounting: new/retained/resurrected classes; churn identity") {
    // u1 active days 0,1,3; u2 days 1,2; u3 day 3
    // d0: {u1 new}; d1: {u1 retained, u2 new}; d2: {u2 retained},
    //   churned(2) = active(1) − retained(2) = 2 − 1 = 1 (u1)
    // d3: {u1 resurrected, u3 new}, churned(3) = 1 − 0 = 1 (u2)
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val rows = Seq((1L, 0), (1L, 1), (1L, 3), (2L, 1), (2L, 2), (3L, 3))
      .zipWithIndex.map { case ((u, d), i) => (i.toLong, u, dayTs(d, i), "e") }
    val out = EventOps.growthAccounting(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "user_id", "ts")
      .select("day", "n_active", "n_new", "n_retained", "n_resurrected",
        "n_churned")
      .as[(Long, Long, Long, Long, Long, Option[Long])]
      .collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (0L, 1L, 1L, 0L, 0L, None),
      (1L, 2L, 1L, 1L, 0L, Some(0L)),
      (2L, 1L, 0L, 1L, 0L, Some(1L)),
      (3L, 2L, 1L, 0L, 1L, Some(1L))))
  }

  test("overlapDegree: order-statistics identity, inclusive touch, no self-count") {
    // [0,10] [5,20] [10,30] [40,50] → degrees 2,2,2,0 ([0,10] touches
    // [10,30] at 10 — inclusive ends make that an overlap)
    val iv = Seq((1L, 0L, 10L), (2L, 5L, 20L), (3L, 10L, 30L),
      (4L, 40L, 50L)).toDF("id", "st", "en")
    val out = EventOps.overlapDegree(iv, "id", "st", "en",
        bucketSeconds = 7L) // force boundaries across buckets
      .select("id", "degree").as[(Long, Long)].collect().toMap
    assert(out === Map(1L -> 2L, 2L -> 2L, 3L -> 2L, 4L -> 0L))
  }

  test("dispersionCensus: Fano, peak-to-mean, and silent days on the shared spine") {
    // spine days {0,1,2}; d = [2,0,4] → fano 24/18, peak 2.0, zero 1/3
    //                     e = [0,1,0] → fano 2/3,   peak 3.0, zero 2/3
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val rows = Seq((1L, 1L, dayTs(0, 0), "d"), (2L, 1L, dayTs(0, 1), "d"),
      (3L, 1L, dayTs(2, 0), "d"), (4L, 1L, dayTs(2, 1), "d"),
      (5L, 1L, dayTs(2, 2), "d"), (6L, 1L, dayTs(2, 3), "d"),
      (7L, 2L, dayTs(1, 0), "e"))
    val out = EventOps.dispersionCensus(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out === Map(
      "d" -> ((3L, 6L, 13333L, 20000L, 3333L)),
      "e" -> ((3L, 1L, 6667L, 30000L, 6667L))))
  }

  test("dowSeasonality: weekday index on the zero-filled spine, epoch-mod-7 bucketing") {
    // spine days {0, 1, 7, 8}: dow 0 = {0, 7}, dow 1 = {1, 8}.
    // type a counts: day0=2, day7=4 (dow0 s=6), day1=1, day8=1 (dow1
    // s=2) → total 8 over t=4 days, mean 2/day.
    //   dow0: mean 3 → index 15000, share 7500
    //   dow1: mean 1 → index 5000,  share 2500
    // type b fires only on day 1 → dow0 index 0 share 0, dow1 20000/10000
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val rows =
      (0 until 2).map(i => (i.toLong, 1L, dayTs(0, i), "a")) ++
      (0 until 4).map(i => (10L + i, 1L, dayTs(7, i), "a")) ++
      Seq((20L, 1L, dayTs(1, 0), "a"), (21L, 1L, dayTs(8, 0), "a"),
        (30L, 2L, dayTs(1, 1), "b"))
    val out = EventOps.dowSeasonality(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type")
      .as[(String, Int, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out === Map(
      ("a", 0) -> ((2L, 6L, 15000L, 7500L)),
      ("a", 1) -> ((2L, 2L, 5000L, 2500L)),
      ("b", 0) -> ((2L, 0L, 0L, 0L)),
      ("b", 1) -> ((2L, 1L, 20000L, 10000L))))
  }

  test("trendBreak: piecewise-linear series splits at the slope change") {
    // counts [1,2,3,10,11,12]: both halves are perfect lines (SSE 0),
    // total-fit SSE = 7776/630 → gain4 = 123429; slopes 1.0 both sides
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val rows = for {
      (c, d) <- Seq(1, 2, 3, 10, 11, 12).zipWithIndex; i <- 0 until c
    } yield (d * 100L + i, 1L, dayTs(d, i), "brk")
    val out = EventOps.trendBreak(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type")
      .select("etype", "break_day", "n_left", "n_right", "gain4",
        "slope_l6", "slope_r6")
      .as[(String, Long, Long, Long, Long, Option[Long], Option[Long])]
      .collect().toSeq
    assert(out === Seq(("brk", 2L, 3L, 3L, 123429L,
      Some(1000000L), Some(1000000L))))
  }

  test("theilSenSlope: median pairwise slope shrugs off the outlier day") {
    // counts [1,2,3,100]: slopes {1,1,33,1,49,97} → lower median 1.0
    // (least squares would report ~28.8/day)
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    val rows = for {
      (c, d) <- Seq(1, 2, 3, 100).zipWithIndex; i <- 0 until c
    } yield (d * 1000L + i, 1L, dayTs(d, i), "ts")
    val out = EventOps.theilSenSlope(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type")
      .as[(String, Long, Long)].collect().toSeq
    assert(out === Seq(("ts", 6L, 1000000L)))
  }

  test("crossCorrelation: hand-computed lead–lag; x leads y by one day") {
    // x = [1,3,1,3], y = [2,1,3,1] (y_{t+1} = x_t for t = 1..3)
    // integer scaling: T=4 Sx=8 Sy=7 Qx=20 Qy=15 → Dx·T²=64, Dy·T²=44
    // (x,y,k=1): C=11 A=5 B=5 → num=44  → r4 = round(1e4·44/√2816) = 8292
    // (x,y,k=0): C=11 → num=−48         → r4 = −9045 (and same for y,x,0)
    // (y,x,k=1): C=16 A=6 B=7 → num=36  → r4 = 6784
    def dayTs(d: Int, i: Int) = new Timestamp(d * 86400000L + i * 1000L)
    def mk(tp: String, counts: Seq[Int], base: Long) = for {
      (c, d) <- counts.zipWithIndex; i <- 0 until c
    } yield (base + d * 10 + i, 1L, dayTs(d, i), tp)
    val rows = mk("x", Seq(1, 3, 1, 3), 0L) ++ mk("y", Seq(2, 1, 3, 1), 1000L)
    val out = EventOps.crossCorrelation(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type", maxLag = 1)
      .select("ex", "ey", "lag", "n_pairs", "r4")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2, r._3) -> ((r._4, r._5))).toMap
    def r4(num: Long, dx: Long, dy: Long): Long =
      java.math.BigDecimal.valueOf(
          1e4 * (num.toDouble / math.sqrt(dx.toDouble * dy.toDouble)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    assert(out === Map(
      ("x", "y", 0L) -> ((4L, r4(-48, 64, 44))),
      ("y", "x", 0L) -> ((4L, r4(-48, 44, 64))),
      ("x", "y", 1L) -> ((3L, r4(44, 64, 44))),
      ("y", "x", 1L) -> ((3L, r4(36, 44, 64)))))
    assert(r4(44, 64, 44) === 8292L)
    assert(r4(36, 44, 64) === 6784L)
    assert(r4(-48, 64, 44) === -9045L)
  }

  test("intervalCoverage: islands need the running max, not lag(en)") {
    // u: (1,5)(2,3)(3,6)(8,9) → islands [1,6] + [8,9]: covered 6+2
    // w: (1,10)(2,3)(4,5)(11,12) — the long first interval SWALLOWS
    //    (4,5); lag(en)=3 < 4 would wrongly open an island there
    // t: (1,3)(3,5) share endpoint 3 → ONE island; (1,2)(3,4) adjacent
    //    integers → TWO
    val iv = Seq(
      ("u", 1L, 5L), ("u", 2L, 3L), ("u", 3L, 6L), ("u", 8L, 9L),
      ("w", 1L, 10L), ("w", 2L, 3L), ("w", 4L, 5L), ("w", 11L, 12L),
      ("t", 1L, 3L), ("t", 3L, 5L),
      ("s", 1L, 2L), ("s", 3L, 4L)).toDF("k", "st", "en")
    val out = EventOps.intervalCoverage(iv, "k", "st", "en")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      "u" -> ((4L, 2L, 8L, 9L)),
      "w" -> ((4L, 2L, 12L, 12L)),
      "t" -> ((2L, 1L, 5L, 5L)),
      "s" -> ((2L, 2L, 4L, 4L))))
  }

  test("sequencePatternCensus: ordered rebuild, non-overlap count, purchase fence") {
    import graft.operators.EventOps
    // u: v c p v v c p e → two non-overlapping funnel runs
    // w: c v p → click BEFORE view: no match
    // x: v p c p → the first purchase fences the [^p]* gap: no match
    // rows arrive SHUFFLED — the collect_list sort must restore order
    val mk = Seq(
      ("u", 7L, "purchase"), ("u", 1L, "view"), ("u", 4L, "view"),
      ("u", 2L, "click"), ("u", 8L, "error"), ("u", 3L, "purchase"),
      ("u", 6L, "click"), ("u", 5L, "view"),
      ("w", 1L, "click"), ("w", 2L, "view"), ("w", 3L, "purchase"),
      ("x", 1L, "view"), ("x", 2L, "purchase"), ("x", 3L, "click"),
      ("x", 4L, "purchase")).map { case (u, t, e) =>
      (u, new Timestamp(t * 1000L), t, e)
    }.toDF("k", "ts", "tie", "et")
    val out = EventOps.sequencePatternCensus(mk, "k", "ts", "tie", "et",
        "v[^p]*c[^p]*p")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("u" -> ((8L, 2L)), "w" -> ((3L, 0L)),
      "x" -> ((4L, 0L))))
  }

  test("ratioDeltaCi: pooled ratio with linearized variance; zero-var collapses") {
    import graft.operators.EventOps
    // variant 0: (x,y) = (2,4), (4,4) → R = 8/6 = 1.3̅; only x varies,
    // so Var(R) = R²σ²x/(n·x̄²) = (16/9)/18 → se = .31427
    val rows = Seq((0L, 2L, 4L), (0L, 4L, 4L), (1L, 3L, 6L), (1L, 3L, 6L))
      .toDF("variant", "x", "y")
    val out = EventOps.ratioDeltaCi(rows, "variant", "x", "y")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out(0L) === ((2L, 13333L, 314270L, 7174L, 19493L)))
    // identical users → zero variance → the interval collapses on R = 2
    assert(out(1L) === ((2L, 20000L, 0L, 20000L, 20000L)))
  }

  test("markovAttribution: removal effects — bottleneck credited, dead-end not") {
    import graft.operators.EventOps
    // u1: view → purchase; u2: view → click (no conversion);
    // u3: purchase cold. Chain: a(click)=0, a(view)=½,
    // a(START) = (2·½ + 1)/3 = ⅔ → 66666667 on the 1e8 grid.
    // Remove view → only the cold path converts: a = ⅓. Remove click
    // (a dead end that never feeds CONV) → nothing changes: RE = 0.
    val ev = Seq(
      (1L, 1L, "view"), (1L, 2L, "purchase"),
      (2L, 1L, "view"), (2L, 2L, "click"),
      (3L, 1L, "purchase")).map { case (u, t, e) =>
      (u, new Timestamp(t * 1000L), u * 10 + t, e)
    }.toDF("user_id", "ts", "event_id", "event_type")
    val out = EventOps.markovAttribution(ev, "user_id", "ts", "event_id",
        "event_type", "purchase")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      "click" -> ((66666667L, 66666667L, 0L, 0L)),
      "view" -> ((66666667L, 33333333L, 33333334L, 1000000L))))
  }

  test("holtForecast: perfect lines recovered exactly, zero-fill, neg trend") {
    import graft.operators.EventOps
    def ev(g: String, day: Long, k: Int, base: Long) =
      (0 until k).map(i =>
        (g, new Timestamp((day * 86400 + base + i) * 1000L), day * 100 + i))
    // a: 2,4,6 per day — a perfect +2/day line → level 6e4, trend 2e4
    // b: only day 1 (count 3) — days 0 and 2 ZERO-FILLED from the spine
    val rows = (ev("a", 0, 2, 1) ++ ev("a", 1, 4, 1) ++ ev("a", 2, 6, 1)
      ++ ev("b", 1, 3, 2)).toDF("grp", "ts", "eid")
    val out = EventOps.holtForecast(rows, "ts", "grp", horizon = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out(("a", 1L)) === ((60000L, 20000L, 80000L)))
    assert(out(("a", 2L)) === ((60000L, 20000L, 100000L)))
    // hand-walked zero-filled series 0,3,0: l₂ 42000, b₂ 26400
    assert(out(("b", 1L)) === ((42000L, 26400L, 68400L)))
    // a falling perfect line 6,4,2: trend −2e4 (exercises the FLOOR
    // division on negative numerators), forecast crosses zero at h=2
    val fall = (ev("f", 0, 6, 1) ++ ev("f", 1, 4, 1) ++ ev("f", 2, 2, 1))
      .toDF("grp", "ts", "eid")
    val f = EventOps.holtForecast(fall, "ts", "grp", horizon = 2)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5))).toMap
    assert(f(1L) === ((20000L, -20000L, 0L)))
    assert(f(2L) === ((20000L, -20000L, -20000L)))
  }

  test("hampelFilter: spike flagged against robust window stats, normal day not") {
    import graft.operators.EventOps
    def ev(day: Long, k: Int) = (0 until k).map(i =>
      ("g", new Timestamp((day * 86400 + i) * 1000L)))
    // 5,5,5,50,5,5,5,5,5 — the day-3 spike towers over med 5 / mad 0
    val rows = (0 to 8).flatMap(d => ev(d, if (d == 3) 50 else 5))
      .toDF("grp", "ts")
    val out = EventOps.hampelFilter(rows, "ts", "grp")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out(3L) === ((50L, 5L, 0L, true)))   // spike flagged
    assert(out(0L) === ((5L, 5L, 0L, false)))   // edge window, no flag
    assert(out(6L) === ((5L, 5L, 0L, false)))   // spike left the window
    // healthy variation: full window has mad 1 → |y−med| = 1 passes
    val varied = Seq(4, 5, 6, 5, 4, 5, 6).zipWithIndex
      .flatMap { case (k, d) => ev(d.toLong, k) }.toDF("grp", "ts")
    val v = EventOps.hampelFilter(varied, "ts", "grp")
      .as[(String, Long, Long, Long, Long, Boolean)].collect()
      .map(r => r._2 -> ((r._4, r._5, r._6))).toMap
    assert(v(3L) === ((5L, 1L, false)))
  }

  test("logRank: hand-computed O−E and variance; identical groups → z = 0") {
    import graft.operators.EventOps
    // A: (1,ev)(2,cens)(3,ev); B: (1,ev)(3,ev)(3,cens)
    // t=1: n 3v3, d 1+1 → O−E 0, V = 2·¼·(4/5) = .4
    // t=2: censored only → no term, but A's risk set shrinks
    // t=3: n1=1 n2=2, d=2 → O−E = 1−2/3 = ⅓ → 333333; V = 2/9 → 222222
    // z = .333333/√.622222 → 4226 on the 1e4 grid
    val lives = Seq(("a", 1L, 1L), ("a", 2L, 0L), ("a", 3L, 1L),
      ("b", 1L, 1L), ("b", 3L, 1L), ("b", 3L, 0L)).toDF("g", "t", "ev")
    val out = EventOps.logRank(lives, "t", "ev", "g", "a", "b")
      .as[(Long, Long, Long, Long, Long, Long)].collect().head
    assert(out === ((3L, 3L, 2L, 333333L, 622222L, 4226L)))
    // the same durations in both groups → every O−E term is zero
    val same = Seq(("a", 1L, 1L), ("a", 2L, 1L), ("b", 1L, 1L),
      ("b", 2L, 1L)).toDF("g", "t", "ev")
    val z = EventOps.logRank(same, "t", "ev", "g", "a", "b")
      .select("o_minus_e6", "z4").as[(Long, Long)].collect().head
    assert(z === ((0L, 0L)))
  }

  test("gapFillLocf: per-key spine, carried totals, gap flags") {
    import graft.operators.EventOps
    // u: day 10 (two events, 100+200 cents) … day 13 (50 cents):
    // days 11/12 materialize as gaps carrying 300
    // w: single day → one row, no gaps (spine is per KEY, not global)
    def at(day: Long, off: Long) = new Timestamp((day * 86400 + off) * 1000L)
    val ev = Seq(
      ("u", at(10, 1), 1L, 1.00), ("u", at(10, 2), 2L, 2.00),
      ("u", at(13, 3), 3L, 0.50),
      ("w", at(20, 4), 4L, 9.00)).toDF("k", "ts", "event_id", "v")
    val out = EventOps.gapFillLocf(ev, "k", "ts", "v")
      .as[(String, Long, Long, Option[Long], Long, Boolean)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5, r._6))).toMap
    assert(out === Map(
      ("u", 10L) -> ((2L, Some(300L), 300L, false)),
      ("u", 11L) -> ((0L, None, 300L, true)),
      ("u", 12L) -> ((0L, None, 300L, true)),
      ("u", 13L) -> ((1L, Some(50L), 50L, false)),
      ("w", 20L) -> ((1L, Some(900L), 900L, false))))
  }

  test("sprtBinary: first crossing each way, continue case, bucketed cumulative") {
    import graft.operators.EventOps
    // synthetic grid: +100 per success, −100 per failure, bounds ±250
    def run(flags: Seq[Boolean], bucket: Long = 10L) = {
      val rows = flags.zipWithIndex.map { case (f, i) =>
        (new Timestamp(i * 5000L + (i / 2) * 10000L), i.toLong, f)
      }.toDF("ts", "event_id", "ok")
      EventOps.sprtBinary(rows, "ts", "event_id", col("ok"),
          a6 = 100L, b6 = -100L, up6 = 250L, lo6 = -250L,
          bucketSeconds = bucket)
        .as[(Long, Long, Long, Option[Long], String)].collect().head
    }
    // S S S F: crosses +250 at n=3 (llr 300); final llr back to 200.
    // bucketSeconds = 10 splits the 4 trials across buckets, so the
    // two-phase offsets are load-bearing, not decorative
    assert(run(Seq(true, true, true, false)) ===
      ((4L, 3L, 200L, Some(3L), "accept_h1")))
    // F F F: crosses −250 at n=3
    assert(run(Seq(false, false, false)) ===
      ((3L, 0L, -300L, Some(3L), "accept_h0")))
    // S F S F: oscillates inside the bounds → continue, no decision n
    assert(run(Seq(true, false, true, false)) ===
      ((4L, 2L, 0L, None, "continue")))
  }

  test("twap: trapezoid weighting, half-up rounding, span-0 fallback, bucket split") {
    import graft.operators.EventOps
    def ev(grp: String, sec: Long, id: Long, v: Double) =
      (grp, new Timestamp(sec * 1000L), id, v)
    // g: (0s,1.00)(10s,3.00)(30s,1.00) → 2A = 400·10 + 400·20 = 12000,
    //    span 30 → 12000/60 = 200 cents — the long middle plateau wins
    //    (the plain mean of cents is 167)
    // h: (0s,1.00)(1s,1.01) → 201/2 = 100.5 → half-up → 101
    // i: single event → twap = its own cents
    // j: 86399s vs 86401s → DIFFERENT day buckets, both span-0
    val rows = Seq(
      ev("g", 0, 1, 1.00), ev("g", 10, 2, 3.00), ev("g", 30, 3, 1.00),
      ev("h", 0, 4, 1.00), ev("h", 1, 5, 1.01),
      ev("i", 40, 6, 2.50),
      ev("j", 86399, 7, 9.00), ev("j", 86401, 8, 4.00))
      .toDF("grp", "ts", "event_id", "v")
    val out = EventOps.twap(rows, "grp", "ts", "event_id", "v")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4, r._5))).toMap
    assert(out === Map(
      ("g", 0L) -> ((3L, 30L, 200L)),
      ("h", 0L) -> ((2L, 1L, 101L)),
      ("i", 0L) -> ((1L, 0L, 250L)),
      ("j", 0L) -> ((1L, 0L, 900L)),
      ("j", 1L) -> ((1L, 0L, 400L))))
  }

  test("clampedBalance: floor resets the fold; windowed cumsum can't") {
    import graft.operators.EventOps
    // u: +5 −8 +3 −1 −4 +7 → bal 5,0,3,2,0,7: final 7, 2 clamps, max 7
    //    (a clamped cumsum-with-greatest would carry the −3 debt into
    //     the +3 step and report 0 there — the fold must reset)
    // w: +10 −4 +1 → 10,6,7: final 7, 0 clamps, max 10 (mid-sequence)
    // rows arrive SHUFFLED; the struct sort must restore ts order
    val rows = Seq(
      ("u", 4, 40L, -1L), ("u", 1, 10L, 5L), ("u", 6, 60L, 7L),
      ("u", 2, 20L, -8L), ("u", 5, 50L, -4L), ("u", 3, 30L, 3L),
      ("w", 2, 21L, -4L), ("w", 1, 11L, 10L), ("w", 3, 31L, 1L))
      .toDF("k", "t", "tie", "d")
    val out = EventOps.clampedBalance(rows, "k", "t", "tie", "d")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      "u" -> ((6L, 7L, 2L, 7L)),
      "w" -> ((3L, 7L, 0L, 10L))))
  }

  test("kaplanMeier: censored subjects hold the risk set, exact grid chain") {
    import graft.operators.EventOps
    // durations (t, ev): (1,1) (1,1) (2,0 censored) (3,1) (3,0)
    // t=1: risk 5, d 2 → s8 = 3/5 → 60000000
    // t=2 censored-only: NO step row, but removes one from risk
    // t=3: risk 2 (not 3 — the t=2 censor left), d 1 → 60000000/2
    val lives = Seq((1L, 1L), (1L, 1L), (2L, 0L), (3L, 1L), (3L, 0L))
      .toDF("t", "ev")
    val out = EventOps.kaplanMeier(lives, "t", "ev")
      .as[(Long, Long, Long, Long)].collect().toSeq.sortBy(_._1)
    assert(out === Seq((1L, 5L, 2L, 60000000L), (3L, 2L, 1L, 30000000L)))
    // no events at all → empty curve
    assert(EventOps.kaplanMeier(Seq((4L, 0L)).toDF("t", "ev"), "t", "ev")
      .count() === 0L)
    // round-half-up on the grid: one subject of three fails → 2/3
    val third = Seq((1L, 1L), (2L, 0L), (3L, 0L)).toDF("t", "ev")
    val s = EventOps.kaplanMeier(third, "t", "ev")
      .select("s8").as[Long].collect().head
    assert(s === 66666667L)  // (2·1e8·2 + 3) div 6: 2/3 rounds UP on the grid
  }

  test("markovBacktest: modal successor, lexicographic tie-break, exact accuracy") {
    // u1: a b a b → a→b ×2, b→a ×1;  u2: a c → a→c ×1
    // u3: c a → c→a ×1;  u4: c x → c→x ×1 (tie at c → predict 'a')
    val seqs = Seq(1L -> Seq("a", "b", "a", "b"), 2L -> Seq("a", "c"),
      3L -> Seq("c", "a"), 4L -> Seq("c", "x"))
    val rows = for {
      (u, es) <- seqs; (e, i) <- es.zipWithIndex
    } yield (u * 100 + i, u, ts(i + 1), e)
    val out = EventOps.markovBacktest(rows.toDF("event_id", "user_id", "ts",
        "event_type"), "user_id", "ts", "event_id", "event_type")
      .select("from_type", "predicted_next", "n_transitions", "n_correct",
        "acc4")
      .as[(String, String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      "a" -> (("b", 3L, 2L, 6667L)),
      "b" -> (("a", 1L, 1L, 10000L)),
      "c" -> (("a", 2L, 1L, 5000L))))
  }

  test("maxDrawdown: deepest peak-to-trough, first-bottom tie-break, flat series") {
    // series 10, 14, 9, 12, 6, 6: peak path 10,14,14,14,14,14;
    // drawdowns 0,0,5,2,8,8 → max 8, first bottomed at ord 5, peak 14
    val s = Seq((1L, 10L), (2L, 14L), (3L, 9L), (4L, 12L), (5L, 6L),
      (6L, 6L)).toDF("d", "v")
    val out = EventOps.maxDrawdown(s, "d", "v")
      .as[(Long, Long, Long)].head()
    assert(out === ((8L, 5L, 14L)))
    // non-decreasing series: zero drawdown at the first step
    val up = Seq((1L, 3L), (2L, 3L), (3L, 7L)).toDF("d", "v")
    assert(EventOps.maxDrawdown(up, "d", "v")
      .as[(Long, Long, Long)].head() === ((0L, 1L, 3L)))
  }

  test("eventKgrams: sliding windows, occurrence vs user support, short strings drop") {
    // u1: v c p v  → vcp, cpv ; u2: v c p → vcp ; u3: v c (too short)
    val rows = Seq(
      (1L, 1L, ts(1), "view"), (2L, 1L, ts(2), "click"),
      (3L, 1L, ts(3), "purchase"), (4L, 1L, ts(4), "view"),
      (5L, 2L, ts(1), "view"), (6L, 2L, ts(2), "click"),
      (7L, 2L, ts(3), "purchase"),
      (8L, 3L, ts(1), "view"), (9L, 3L, ts(2), "click"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventOps.eventKgrams(rows, "user_id", "ts", "event_id",
        "event_type", 3)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("vcp" -> ((2L, 2L)), "cpv" -> ((1L, 1L))))
  }

  test("throttleDedup: decisions chain off the last KEPT event, not the last row") {
    // gap = 10 s. Events at 0, 4, 8, 12, 25 s:
    //  keep 0; 4 < 0+10 drop; 8 < 0+10 drop; 12 ≥ 0+10 keep;
    //  25 ≥ 12+10 keep → 3 kept, last 25 s.
    // A lag()-based rule would WRONGLY drop 12 (12 − 8 < 10).
    val rows = Seq(0, 4, 8, 12, 25).zipWithIndex.map { case (sec, i) =>
      (i.toLong, 1L, ts(sec), "click")
    }.toDF("event_id", "user_id", "ts", "event_type")
    val out = EventOps.throttleDedup(rows, Seq("user_id", "event_type"),
        "ts", "event_id", 10L * 1000000L)
      .select("n_events", "n_kept", "last_kept_us")
      .as[(Long, Long, Long)].head()
    assert(out === ((5L, 3L, 1704067200000000L + 25L * 1000000L)))
  }

  test("windowedConversion: deadline inclusive, same-ts excluded, per-user counts") {
    // window 10 s. u1: views at 0, 30, 50; purchases at 10, 35.
    //   view@0 → purchase@10 (≤ 0+10, inclusive end) converts
    //   view@30 → purchase@35 converts; view@50 → nothing
    // u2: view at 0, purchase at 0 (NOT after) and at 11 (> deadline)
    val rows = Seq(
      (1L, 1L, ts(0), "view"), (2L, 1L, ts(30), "view"),
      (3L, 1L, ts(50), "view"), (4L, 1L, ts(10), "purchase"),
      (5L, 1L, ts(35), "purchase"),
      (6L, 2L, ts(0), "view"), (7L, 2L, ts(0), "purchase"),
      (8L, 2L, ts(11), "purchase"))
      .toDF("event_id", "user_id", "ts", "event_type")
    val out = EventOps.windowedConversion(rows, "user_id", "ts",
        "event_type", "view", "purchase", 10L * 1000000L)
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(1L -> ((3L, 2L)), 2L -> ((1L, 0L))))
  }

  test("exactMedian2: odd doubles the middle, even sums the two middles") {
    import graft.operators.Profiling
    val df = Seq(("a", 1L), ("a", 9L), ("a", 4L),            // odd: 2·4
      ("b", 2L), ("b", 10L), ("b", 6L), ("b", 4L),           // even: 4+6
      ("c", 7L)).toDF("g", "v")                              // singleton: 2·7
    val out = Profiling.exactMedian2(df, "g", "v")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map("a" -> ((3L, 8L)), "b" -> ((4L, 10L)),
      "c" -> ((1L, 14L))))
  }

  test("tukeyOutliers: hand hinges on both parities, fence counts") {
    import graft.operators.Profiling
    // g "a", n=7 values 1..6,100: nl=4 → lower half ranks 1-4 (1,2,3,4):
    //   even half → lo2 = 2+3 = 5; upper half (4,5,6,100) → hi2 = 5+6 = 11
    //   low fence: 4v < 5·5−3·11 = −8 → none; high: 4v > 5·11−3·5 = 40
    //   → v > 10 → only 100 → n_high = 1
    val a = Seq(1L, 2L, 3L, 4L, 5L, 6L, 100L).map(("a", _))
    // g "b", n=4 values 0,10,20,1000: nl=2 → lo half (0,10) lo2=10;
    //   hi half (20,1000) hi2=1020. low: 4v < 50−3060 <0 → none;
    //   high: 4v > 5100−30=5070 → v>1267.5 → none
    val b = Seq(0L, 10L, 20L, 1000L).map(("b", _))
    val out = Profiling.tukeyOutliers((a ++ b).toDF("g", "v"), "g", "v")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out === Map(
      "a" -> ((7L, 5L, 11L, 0L, 1L)),
      "b" -> ((4L, 10L, 1020L, 0L, 0L))))
  }

  test("trimmedMean: rank trim both tails, round-half-up mean") {
    import graft.operators.Profiling
    // n=20 values: 0, 2..19, 5000 → 5% trim drops 1 from each tail
    // (20·5 div 100 = 1): keep 2..19 → sum 189, mean 189/18 = 10.5 → 11
    val vs = (Seq(0L) ++ (2L to 19L) ++ Seq(5000L)).map(("a", _))
    val out = Profiling.trimmedMean(vs.toDF("g", "v"), "g", "v", pct = 5)
      .as[(String, Long, Long, Long)].head()
    assert(out === (("a", 20L, 18L, 11L)))
  }

  test("seasonalMadAnomalies: lag-period residuals, zero-MAD degeneracy, worst day") {
    // 15 days, weekly-flat 5 events/day except day 9 has 9 events.
    // Residuals (days 7-14 vs lag-7): all 0 except day 9 → 4.
    // MAD2 over [0×7, 4] (even 8 → ranks 4,5) = 0 → any nonzero
    // residual is anomalous: exactly day 9.
    val base = 19723L  // ts(0) is exactly midnight → day index base
    val rows = for {
      d <- 0 to 14
      k <- 1 to (if (d == 9) 9 else 5)
    } yield ((d * 100 + k).toLong, 1L, ts(d * 86400), "e")
    val out = EventOps.seasonalMadAnomalies(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "event_type", "ts", period = 7)
      .as[(String, Long, Long, Long, Long, Long)].head()
    assert(out === (("e", 8L, 0L, 1L, 4L, base + 9L)))
  }

  test("holtWintersForecast: hand-computed period-2 recursion with negative seasonal") {
    // days 0..3, counts 1,3,2,4; m=2 → init l=20000, b=0,
    // s=[-10000, 10000]; two update steps (worked in comments below):
    //   i=2: l=23000, b=600, snew=-7900 (floor(-7899.5))
    //   i=3: l=25520, b=984, snew=11344
    // forecasts: h1 = 25520+984-7900 = 18604; h2 = 25520+1968+11344.
    val rows = for {
      (y, d) <- Seq(1, 3, 2, 4).zipWithIndex
      k <- 1 to y
    } yield ((d * 100 + k).toLong, 1L, ts(d * 86400), "g")
    val out = EventOps.holtWintersForecast(
        rows.toDF("event_id", "user_id", "ts", "event_type"),
        "ts", "event_type", period = 2)
      .as[(String, Long, Long, Long, Long, Long)].collect().toSet
    assert(out === Set(
      ("g", 1L, 25520L, 984L, -7900L, 18604L),
      ("g", 2L, 25520L, 984L, 11344L, 38832L)))
    // fewer than m+1 days → no rows, not a crash
    val short = Seq((1L, 1L, ts(0), "g"), (2L, 1L, ts(86400), "g"))
      .toDF("event_id", "user_id", "ts", "event_type")
    assert(EventOps.holtWintersForecast(short, "ts", "event_type",
      period = 2).isEmpty)
  }

  test("fkOrphans: null keys counted apart from orphans") {
    import graft.operators.Profiling
    val child = Seq(Some(1L), Some(1L), Some(7L), None)
      .toDF("ck")
    val parent = Seq(1L, 2L).map(Tuple1(_)).toDF("pk")
    val out = Profiling.fkOrphans("c->p", child, "ck", parent, "pk")
      .as[(String, Long, Long, Long)].head()
    assert(out === (("c->p", 4L, 1L, 1L)))
  }

  test("nearestRankQuantiles: ceil-rank order statistics, actual observations only") {
    import graft.operators.Profiling
    // n=10 values 10..100 by 10: P50 → rank ⌈5⌉ = 5 → 50;
    // P90 → rank 9 → 90; P99 → rank ⌈9.9⌉ = 10 → 100.
    // n=3 values 1,2,3: P50 → rank 2 → 2; P90 → rank 3; P99 → rank 3.
    val df = ((1 to 10).map(i => ("a", i * 10L)) ++
      Seq(("b", 1L), ("b", 2L), ("b", 3L))).toDF("g", "v")
    val out = Profiling.nearestRankQuantiles(df, "g", "v")
      .as[(String, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(out === Map(
      ("a", 50L) -> ((10L, 50L)), ("a", 90L) -> ((10L, 90L)),
      ("a", 99L) -> ((10L, 100L)),
      ("b", 50L) -> ((3L, 2L)), ("b", 90L) -> ((3L, 3L)),
      ("b", 99L) -> ((3L, 3L))))
  }

  test("benfordDigits: hand census, grid shares, sub-1 and null rows drop") {
    import graft.operators.Profiling
    // digits: 1 ×2 (1.5, 19), 2 ×1 (250), 9 ×1 (9e3); 0.4 and null drop
    val df = Seq(Some(1.5), Some(19.0), Some(250.0), Some(9000.0),
      Some(0.4), None).toDF("x")
    val out = Profiling.benfordDigits(df, "x")
      .select("digit", "n", "share6", "expected6", "dev6")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(out === Map(
      "1" -> ((2L, 500000L, 301030L, 198970L)),
      "2" -> ((1L, 250000L, 176091L, 73909L)),
      "9" -> ((1L, 250000L, 45757L, 204243L))))
  }
}
