package graft

import org.apache.spark.sql.functions._

/** Quantitative accuracy bounds for the approximate ("rows-only")
  * query paths, so each scale-path estimator carries an asserted
  * guarantee, not just a row-count check:
  *
  *  - q10b `approx_count_distinct` (HyperLogLog++) vs exact distinct
  *  - q38b `approx_percentile` (mergeable sketch) vs exact percentile,
  *    bounded in RANK space (the sketch's actual contract)
  *
  * The other two rows-only queries hold their bounds in their own
  * suites: q32b IVF recall vs brute force in `LshRecallSpec`, q62 MMR
  * duplicate eviction in `DedupSimilaritySpec`.
  */
class ApproxAccuracySpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q10b: HLL distinct counts within ±5% of exact, per group") {
    // run the REGISTERED query (not an inline re-implementation), so a
    // driver change to q10b's estimator or its rsd is caught here even
    // though the oracle gate can't see inside the estimate
    val approx = graft.queries.Registry.byName("q10b_approx_distinct")
      .run(spark, dir).collect()
      .map(r => r.getString(0) -> r.getAs[Long]("approx_n_part")).toMap
    val exact = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"))
      .agg(countDistinct(col("l_partkey")).as("exact"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("exact")).toMap
    assert(approx.nonEmpty && approx.keySet === exact.keySet)
    approx.foreach { case (grp, a) =>
      val e = exact(grp).toDouble
      val relErr = math.abs(a - e) / e
      assert(relErr <= 0.05,
        s"HLL estimate $a vs exact $e (rel err $relErr) for $grp")
    }
  }

  test("q38b: approx_percentile within 2% rank tolerance of the target, per group") {
    val orders = Tables.orders(spark, dir)
      .select(col("o_orderpriority"), col("o_totalprice").cast("double").as("v"))
    // the registered query's own sketch answers (rounded to 3dp there —
    // far inside the 2% rank tolerance)
    val approx = graft.queries.Registry.byName("q38b_approx_percentiles")
      .run(spark, dir).collect()
      .map(r => r.getString(0) ->
        (r.getAs[Number]("p50").doubleValue(),
          r.getAs[Number]("p90").doubleValue())).toMap
    assert(approx.nonEmpty)
    // rank-space check: the fraction of group values ≤ the sketch's
    // answer must sit within ±2% of the requested quantile (accuracy
    // 10000 guarantees 1/10000; 2% absorbs ties/interpolation)
    val ranks = orders.collect().groupBy(_.getString(0))
      .map { case (grp, rows) =>
        val vs = rows.map(_.getDouble(1)).sorted
        def rankOf(x: Double) = vs.count(_ <= x).toDouble / vs.length
        grp -> (rankOf(approx(grp)._1), rankOf(approx(grp)._2))
      }
    ranks.foreach { case (grp, (r50, r90)) =>
      assert(math.abs(r50 - 0.5) <= 0.02, s"$grp p50 landed at rank $r50")
      assert(math.abs(r90 - 0.9) <= 0.02, s"$grp p90 landed at rank $r90")
    }
  }
}
