package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._

/** Integer-exact weighted Bernoulli sampling: laws the pure-integer
  * acceptance test must satisfy. */
class WeightedSampleSpec extends SparkSpec {
  import spark.implicits._

  private def flags(rows: Seq[(Long, Double)], num: Int, den: Int): Map[Long, Boolean] =
    Sampling.weightedBernoulliSample(rows.toDF("id", "w"), "id", "w", num, den)
      .select(col("id").cast("long"), col("kept"))
      .as[(Long, Boolean)].collect().toMap

  private val uniform = (1L to 2000L).map(_ -> 1.0)

  test("groupTrainTestSplit: no group straddles splits; the doc-level split DOES leak on the same groups; null group falls back to own key") {
    // one 20-member near-dup cluster (rep 1), one 10-member (rep 100),
    // and two ungrouped docs (null rep)
    val docs = ((1L to 20L).map(i => (i, Option(1L))) ++
      (100L to 109L).map(i => (i, Option(100L))) ++
      Seq((500L, None: Option[Long]), (501L, None: Option[Long])))
      .toDF("doc_id", "cluster_rep")
    val grouped = Sampling.groupTrainTestSplit(
        docs, "cluster_rep", "doc_id", testPct = 30)
      .as[(Long, Option[Long], String)].collect()
    // leakage law: within a group the split is CONSTANT
    grouped.filter(_._2.isDefined).groupBy(_._2.get).foreach {
      case (rep, rows) =>
        assert(rows.map(_._3).distinct.length === 1,
          s"group $rep straddles splits")
    }
    // the doc-level split leaks on the very same data: some member of
    // the 20-doc cluster lands on each side (md5 buckets of 1..20 are
    // not all on one side of 30)
    val docLevel = Sampling.trainTestSplit(docs, "doc_id", 30)
      .as[(Long, Option[Long], String)].collect()
    val c1 = docLevel.filter(_._2.contains(1L)).map(_._3).distinct
    assert(c1.length === 2,
      "fixture must demonstrate the doc-level leak (both splits present)")
    // ungrouped docs split by their own key, not all-one-bucket
    val ung = grouped.filter(_._2.isEmpty)
    assert(ung.map(_._3).toSet.subsetOf(Set("train", "test")))
    // determinism
    val again = Sampling.groupTrainTestSplit(
        docs, "cluster_rep", "doc_id", testPct = 30)
      .as[(Long, Option[Long], String)].collect()
    assert(again.sortBy(_._1).toSeq === grouped.sortBy(_._1).toSeq)
  }

  test("uniform weights keep ≈ the target fraction, deterministically") {
    val k = flags(uniform, 1, 2)
    val k2 = flags(uniform, 1, 2)
    assert(k == k2)
    val frac = k.values.count(identity).toDouble / k.size
    assert(math.abs(frac - 0.5) < 0.05, s"kept fraction $frac far from 1/2")
  }

  test("scale invariance: w → 3·w yields the identical kept set") {
    val rows = (1L to 500L).map(i => i -> (0.1 + (i % 7) * 0.05))
    assert(flags(rows, 1, 2) == flags(rows.map { case (i, w) => i -> w * 3 }, 1, 2))
  }

  test("zero or negative weight is never kept; p ≥ 1 weight always is") {
    // one doc holds ~all the mass: its p = w4·N·num/(Σw4·den) ≥ 1
    val rows = Seq(1L -> 1000.0, 2L -> 0.0, 3L -> -5.0, 4L -> 0.0001)
    val k = flags(rows, 1, 2)
    assert(k(1L), "p >= 1 doc must always be kept")
    assert(!k(2L) && !k(3L), "non-positive weights are never kept")
  }

  test("per-doc monotonicity: raising only your own weight never evicts you") {
    // keep ⟺ u·S < w·N·2⁴⁸/den·num: raising w_i by Δ scales the RHS by
    // (w+Δ)/w but the LHS only by (S+Δ)/S — strictly smaller whenever
    // other docs hold weight — so doc i's verdict can only improve
    val base = (1L to 200L).map(i => i -> 1.0)
    val keptBase = flags(base, 1, 2)
    val keptBoost = flags(base.map { case (i, w) =>
      i -> (if (i == 7L) 50.0 else w) }, 1, 2)
    if (keptBase(7L)) assert(keptBoost(7L))
  }

  test("weightedTopKSample: matches a scalar A-ES replay; k>n returns all; zero weight excluded") {
    val rows = (1L to 500L).map(i => (i, 0.5 + (i % 7) * 0.25)) :+ (501L, 0.0)
    val out = Sampling.weightedTopKSample(rows.toDF("id", "w"), "id", "w", k = 20)
      .orderBy("rn")
      .select(col("id").cast("long"), col("key10"), col("rn"))
      .as[(Long, Long, Int)].collect().toSeq
    // scalar replay of the exact formula
    def u48(id: Long): Long = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(id.toString.getBytes("UTF-8"))
      java.lang.Long.parseLong(d.take(6).map(b => f"${b & 0xff}%02x").mkString, 16)
    }
    val expected = rows.filter(_._2 > 0).map { case (id, w) =>
      val w4 = math.max(math.round(w * 1e4), 0L)
      val key = math.round(
        1e10 * math.log(281474976710656.0 / (u48(id) + 1)) / w4)
      (id, key)
    }.sortBy { case (id, key) => (key, id) }.take(20)
    assert(out.map(r => (r._1, r._2)) === expected)
    assert(out.map(_._3) === (1 to 20))
    assert(!out.exists(_._1 == 501L), "zero-weight item must never be drawn")
    // k beyond the population returns everything sampleable
    val all = Sampling.weightedTopKSample(rows.toDF("id", "w"), "id", "w", k = 10000)
    assert(all.count() === 500L)
    // weight boost can only improve (never worsen) an item's rank
    val boosted = Sampling.weightedTopKSample(rows.map { case (i, w) =>
        (i, if (i == 42L) 100.0 else w) }.toDF("id", "w"), "id", "w", k = 500)
      .where(col("id") === 42L).select("rn").as[Int].head()
    val baseRank = Sampling.weightedTopKSample(rows.toDF("id", "w"), "id", "w", k = 500)
      .where(col("id") === 42L).select("rn").as[Int].head()
    assert(boosted <= baseRank)
  }

  test("per-group A-ES sample equals the global sample drawn on each group alone") {
    val rows = (1L to 300L).map(i => (i, 0.2 + (i % 5) * 0.3, s"g${i % 3}"))
    val grouped = Sampling.weightedTopKSamplePerGroup(
        rows.toDF("id", "w", "grp"), "id", "w", "grp", k = 7)
      .select(col("grp"), col("id").cast("long"), col("key10"), col("rn"))
      .as[(String, Long, Long, Int)].collect().toSet
    val perGroup = (0 until 3).flatMap { g =>
      Sampling.weightedTopKSample(
          rows.filter(_._3 == s"g$g").toDF("id", "w", "grp"), "id", "w", k = 7)
        .select(col("id").cast("long"), col("key10"), col("rn"))
        .as[(Long, Long, Int)].collect().map { case (i, ky, rn) =>
          (s"g$g", i, ky, rn) }
    }.toSet
    assert(grouped === perGroup)
  }

  test("mixtureWaterfill: saturation prefix, exact redistribution, budget edge") {
    val per = Seq(("A", 10L, 1L), ("B", 100L, 1L), ("C", 100L, 2L))
      .toDF("src", "tokens", "tgt")
    // budget 100: A saturates (only 10 of its λ·1 = 30 share exists);
    // the remaining 90 split 2:1 between C and B
    val out = Sampling.mixtureWaterfill(per, 100L)
      .select("source", "allocated", "saturated", "rate4")
      .as[(String, Long, Boolean, Long)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      ("A", 10L, true, 10000L),
      ("B", 30L, false, 3000L),
      ("C", 60L, false, 6000L)))
    assert(out.map(_._2).sum === 100L)
    // budget beyond availability: everything saturates
    val all = Sampling.mixtureWaterfill(per, 300L)
      .select("source", "allocated", "saturated")
      .as[(String, Long, Boolean)].collect().sortBy(_._1).toSeq
    assert(all === Seq(("A", 10L, true), ("B", 100L, true), ("C", 100L, true)))
  }

  test("rangeBuckets: monotone, tie-coherent, balanced up to tie mass") {
    // 1000 rows over 100 distinct grid scores (10-way ties each)
    val rows = (1L to 1000L).map(i => (i, (i % 100) / 100.0))
    val out = Sampling.rangeBuckets(rows.toDF("id", "score"), "id", "score", 8)
      .select(col("id").cast("long"), col("s4"), col("bucket"))
      .as[(Long, Long, Int)].collect()
    assert(out.length === 1000)
    // every row of one grid cell lands in ONE bucket (ties never straddle)
    assert(out.groupBy(_._2).forall(_._2.map(_._3).distinct.length == 1))
    // bucket is monotone in score
    val byBucket = out.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    val ordered = byBucket.toSeq.sortBy(_._1)
    ordered.sliding(2).foreach {
      case Seq((_, lo), (_, hi)) => assert(lo.max < hi.min)
      case _ =>
    }
    // all 8 buckets populated; balance within the 10-row tie mass
    assert(byBucket.keySet === (0 until 8).toSet)
    val sizes = ordered.map(_._2.length)
    assert(sizes.max - sizes.min <= 10,
      s"bucket sizes $sizes unbalanced beyond one tie class")
    // exact law: bucket = floor(cum_before * B / n) over the cell histogram
    val cells = rows.groupBy(r => math.round(r._2 * 1e4)).view
      .mapValues(_.size).toSeq.sortBy(_._1)
    val expected = cells.scanLeft((0L, 0L)) { case ((cum, _), (s4, n)) =>
      (cum + n, s4) }.drop(1)
      .zip(cells).map { case ((cumThrough, s4), (_, n)) =>
        s4 -> ((cumThrough - n) * 8 / 1000).toInt }.toMap
    assert(out.forall { case (_, s4, b) => expected(s4) == b })
  }

  test("neymanAllocation: hand-computed weights, Hamilton seats, exact budget") {
    // A [0,2] → w = √(2·4e8 − 4e8) = 20000; B [0,4] → w = 40000;
    // C [5,5] → zero variance, w = 0. budget 10: bases 3/6/0,
    // leftover 1 → largest remainder is B → 3/7/0.
    val rows = Seq(("A", 0.0), ("A", 2.0), ("B", 0.0), ("B", 4.0),
      ("C", 5.0), ("C", 5.0)).toDF("g", "v")
    val out = graft.operators.Sampling.neymanAllocation(rows, "g", "v", 10L)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map(
      "A" -> ((2L, 20000L, 3L)),
      "B" -> ((2L, 40000L, 7L)),
      "C" -> ((2L, 0L, 0L))))
    assert(out.values.map(_._3).sum === 10L)
  }
}
