package graft

import graft.operators.Profiling
import org.apache.spark.sql.functions._

class ProfilingSpec extends SparkSpec {
  import spark.implicits._

  private lazy val t = Seq(
    (Some(1L), Some(2.5), Some("b")),
    (Some(1L), None, Some("a")),
    (Some(3L), Some(-1.25), None),
    (None, Some(2.5), Some("c"))
  ).toDF("k", "v", "s")

  test("profile: one row per column, exact counts, grid numeric min/max, verbatim strings") {
    val p = Profiling.profile(t, numericCols = Seq("k", "v"),
        stringCols = Seq("s"))
      .collect().map(r => r.getAs[String]("column") -> r).toMap
    assert(p.keySet === Set("k", "v", "s"))
    val k = p("k")
    assert(k.getAs[Long]("n_rows") === 4L && k.getAs[Long]("n_null") === 1L)
    assert(k.getAs[Long]("n_distinct") === 2L)   // countDistinct skips null
    assert(k.getAs[Long]("min4") === 10000L && k.getAs[Long]("max4") === 30000L)
    assert(k.isNullAt(k.fieldIndex("min_s")))
    val v = p("v")
    assert(v.getAs[Long]("min4") === -12500L && v.getAs[Long]("max4") === 25000L)
    val s = p("s")
    assert(s.getAs[String]("min_s") === "a" && s.getAs[String]("max_s") === "c")
    assert(s.isNullAt(s.fieldIndex("min4")))
  }

  test("uniqueViolations / orphanCount / rangeViolations: exact, null-FK excluded, empty-safe") {
    val uv = Profiling.uniqueViolations(t, Seq("k")).head()
    // key 1 appears twice (one dup key, one surplus row); nulls group too
    assert(uv.getAs[Long]("n_dup_keys") === 1L)
    assert(uv.getAs[Long]("n_surplus_rows") === 1L)
    val clean = Profiling.uniqueViolations(t, Seq("k", "v", "s")).head()
    assert(clean.getAs[Long]("n_dup_keys") === 0L &&
      clean.getAs[Long]("n_surplus_rows") === 0L)
    val parent = Seq(1L).toDF("pk")
    // children: 1 matches, 3 orphaned, null FK NOT an orphan
    assert(Profiling.orphanCount(t, "k", parent, "pk")
      .head().getAs[Long]("n_orphans") === 1L)
    assert(Profiling.rangeViolations(t, "v", 0.0, 2.5)
      .head().getAs[Long]("n_violations") === 1L)   // only -1.25; nulls skip
  }

  test("skewCensus: deterministic top-k, exact shares, ceiling salt factor") {
    val df = (Seq.fill(7)("hot") ++ Seq.fill(2)("warm") ++ Seq("cold"))
      .toDF("k")
    val out = Profiling.skewCensus(df, "k", k = 2, targetPerTask = 3L)
      .as[(String, Long, Long, Long)].collect().toSeq
    // hot: 7 rows → share 7000, salt ceil(7/3)=3; warm: 2 → 2000, salt 1
    assert(out === Seq(("hot", 7L, 7000L, 3L), ("warm", 2L, 2000L, 1L)))
  }
}
