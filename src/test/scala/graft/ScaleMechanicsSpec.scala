package graft

import graft.operators.SkewJoin
import graft.sources.Files
import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec

/** Mechanics that only matter at scale, proven on the plan level:
  * salted joins produce correct results; bucketed tables join without
  * a shuffle. */
class ScaleMechanicsSpec extends SparkSpec {
  import spark.implicits._

  test("salted equi-join matches plain join results on skewed data") {
    // one hot key (90%), several cold ones
    val left = ((1 to 900).map(_ => ("hot", 1)) ++ (1 to 100).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val right = Seq(("hot", 10.0), ("k1", 1.0), ("k2", 2.0)).toDF("rk", "w")
    val plain = left.join(right, col("k") === col("rk"))
      .groupBy("k").agg(sum(col("v") * col("w")).as("s"))
      .as[(String, Double)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", "rk", salts = 8)
      .groupBy("k").agg(sum(col("v") * col("w")).as("s"))
      .as[(String, Double)].collect().toSet
    assert(salted === plain)
  }

  test("salting is deterministic across repeated runs") {
    val left = ((1 to 500).map(i => ("hot", i)) ++ (1 to 50).map(i => (s"k$i", i)))
      .toDF("k", "v")
    val right = Seq(("hot", 10.0), ("k1", 1.0)).toDF("rk", "w")
    def run() = SkewJoin.saltedEquiJoin(left, right, "k", "rk", salts = 4)
      .orderBy("k", "v").collect().toSeq
    assert(run() === run())
    def agg() = SkewJoin.saltedSumCount(left.withColumn("v", col("v").cast("double")),
      "k", "v", salts = 4).orderBy("k").collect().toSeq
    assert(agg() === agg())
  }

  test("salted join rejects right/full outer join types") {
    val l = Seq(("a", 1)).toDF("k", "v")
    val r = Seq(("a", 2.0)).toDF("rk", "w")
    Seq("right", "full_outer", "full").foreach { jt =>
      val e = intercept[IllegalArgumentException] {
        SkewJoin.saltedEquiJoin(l, r, "k", "rk", salts = 4, joinType = jt)
      }
      assert(e.getMessage.contains("saltedEquiJoin supports"))
    }
    // left-oriented types pass validation and run
    assert(SkewJoin.saltedEquiJoin(l, r, "k", "rk", 4, "left_semi").count() === 1)
    assert(SkewJoin.saltedEquiJoin(l, r, "k", "rk", 4, "left_anti").count() === 0)
  }

  test("salted aggregation is exact for sum/count") {
    val df = ((1 to 1000).map(_ => ("hot", 2.0)) ++ Seq(("cold", 5.0))).toDF("k", "v")
    val hot = SkewJoin.saltedSumCount(df, "k", "v", salts = 16)
      .where(col("k") === "hot").head()
    assert(hot.getAs[Double]("sum_value") === 2000.0)
    assert(hot.getAs[Long]("n_rows") === 1000L)
  }

  test("runtime bloom filter prunes the probe side of a selective shuffle join") {
    // At scale this is the row-level runtime pruning that keeps a fact
    // scan from shuffling rows a selective dim filter will discard. The
    // thresholds are lowered only because the local fixture is tiny; the
    // optimizer rule and plan shape are exactly the production ones.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val dir = "/root/testdata/sf0.01"
      val lineitem = Tables.lineitem(spark, dir)
      val sel = Tables.orders(spark, dir).where(col("o_orderkey") % 997 === 0)
      val j = lineitem.join(sel, col("l_orderkey") === col("o_orderkey"))
        .groupBy().agg(sum(col("l_quantity")).as("q"))
      val planStr = j.queryExecution.optimizedPlan.toString
      assert(planStr.contains("might_contain") || planStr.contains("bloom_filter"),
        s"expected an injected bloom runtime filter in:\n$planStr")
      assert(j.head().getAs[Double]("q") > 0)  // and it still computes
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("filters and projections reach the parquet scan (pushdown + column pruning)") {
    val dir = "/root/testdata/sf0.01"
    val df = Tables.lineitem(spark, dir)
      .where(col("l_quantity") > 45)
      .select(col("l_orderkey"), col("l_quantity"))
    val scan = df.queryExecution.executedPlan.collectLeaves().collectFirst {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
    }.getOrElse(fail("no FileSourceScanExec found"))
    // predicate pushed into the reader, not evaluated post-scan only
    assert(scan.metadata("PushedFilters").contains("GreaterThan(l_quantity"),
      s"filter not pushed: ${scan.metadata("PushedFilters")}")
    // 2-column projection must not read the other 14 columns
    val read = scan.requiredSchema.fieldNames.toSet
    assert(read === Set("l_orderkey", "l_quantity"), s"over-read: $read")
  }

  test("bucketed tables join without a shuffle exchange") {
    // fresh in-memory catalogs don't know about locations left by prior
    // JVMs — clear both the tables and their directories
    Seq("bkt_a", "bkt_b").foreach { t =>
      spark.sql(s"DROP TABLE IF EXISTS $t")
      val loc = new java.io.File(
        spark.conf.get("spark.sql.warehouse.dir").stripPrefix("file:"), t)
      org.apache.commons.io.FileUtils.deleteQuietly(loc)
    }
    val a = (1L to 1000L).map(i => (i, s"a$i")).toDF("id", "pa")
    val b = (1L to 1000L).map(i => (i, i * 2.0)).toDF("id", "pb")
    Files.writeBucketed(a, "bkt_a", 4, Seq("id"))
    Files.writeBucketed(b, "bkt_b", 4, Seq("id"))
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "id")
    val shuffles = joined.queryExecution.executedPlan.collect {
      case s: ShuffleExchangeExec => s
    }
    assert(shuffles.isEmpty, s"expected shuffle-free bucketed join, got:\n${joined.queryExecution.executedPlan}")
    assert(joined.count() === 1000)
  }

  test("epochMixture and redact plans contain zero shuffle exchanges") {
    val df = (0L until 100L).map(i => (i, "s" + (i % 3), s"text $i"))
      .toDF("doc_id", "source", "text")
    val mixed = graft.operators.Sampling.epochMixture(
      df, "doc_id", "source", Map("s0" -> 2.5, "s1" -> 0.5))
    val scrubbed = df.select(
      graft.functions.TextFunctions.redact(col("text")).as("r"))
    for ((name, plan) <- Seq("epochMixture" -> mixed, "redact" -> scrubbed)) {
      val shuffles = plan.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"$name must be a pure map at any scale, got:\n${plan.queryExecution.executedPlan}")
    }
    assert(mixed.count() > 0)
  }

  test("PQ encode is a pure map and the ADC scan's corpus side never shuffles before scoring") {
    val dir = "/root/testdata/sf0.001"
    val emb = Tables.embeddings(spark, dir)
    val books = graft.operators.Similarity.pqTrain(
      emb, "vec_id", "embedding", dim = 64, m = 4, ksub = 4, iters = 1)
    val enc = graft.operators.Similarity.pqEncode(emb, "vec_id", "embedding", books)
    // the executedPlan string includes the adaptive wrapper's inner plan
    val encStr = enc.queryExecution.executedPlan.toString
    // FanOut may repartition a tiny local file for scan parallelism (a
    // no-op at real scale by construction); nothing else may shuffle
    assert("Exchange".r.findAllIn(encStr).length <= 1,
      s"pqEncode must be map-only beyond FanOut:\n$encStr")
    val top = graft.operators.Similarity.pqTopK(enc, books,
      emb.filter(col("vec_id") < 3), "vec_id", "embedding", k = 3, refine = 10)
    val planStr = top.queryExecution.executedPlan.toString
    assert(planStr.contains("BroadcastNestedLoopJoin") ||
      planStr.contains("BroadcastHashJoin"),
      s"query side must broadcast:\n$planStr")
    assert(!planStr.contains("SortMergeJoin") && !planStr.contains("CartesianProduct"),
      s"corpus must never sort-merge or cartesian for ADC:\n$planStr")
    assert(top.count() > 0)
  }

  test("sparse cosine pair join is keyed on the hashed feature (no cartesian, broadcastable df-cap)") {
    val toks = (1L to 50L)
      .map(i => (i, Seq("w" + i, "w" + (i + 1), "shared")))
      .toDF("id", "ws")
    val pairs = graft.operators.Similarity.sparseCosineNearDups(
      graft.operators.TfIdf.hashedTf(toks, 65536), "id", "f", "tf",
      tau = 0.0, maxDocFreq = 10000)
    val planStr = pairs.queryExecution.executedPlan.toString
    assert(!planStr.contains("CartesianProduct") &&
      !planStr.contains("BroadcastNestedLoopJoin"),
      s"pair generation must stay an equi-join on the feature:\n$planStr")
    assert(pairs.count() > 0)
  }
}
