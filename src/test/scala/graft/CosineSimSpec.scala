package graft

import graft.functions.VectorFunctions
import graft.plans.CosineSim
import org.apache.spark.sql.functions._

/** Native expression vs higher-order-function implementation: identical
  * results (same summation order), registered via both the imperative
  * path and SQL. */
class CosineSimSpec extends SparkSpec {
  import spark.implicits._

  private lazy val vecs = Seq(
    (Array(1f, 2f, 3f), Array(4f, 5f, 6f)),
    (Array(0f, 0f, 0f), Array(1f, 1f, 1f)),      // zero norm → 0.0
    (Array(1f, 0f), Array(1f, 0f))).toDF("a", "b")

  test("native CosineSim equals the HOF cosine bit-for-bit") {
    CosineSim.register(spark)
    val out = vecs.select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    out.foreach { case (n, h) => assert(n === h) }
    assert(out(1)._1 === 0.0)
  }

  test("registered function is callable from SQL") {
    CosineSim.register(spark)
    vecs.createOrReplaceTempView("cs_vecs")
    val r = spark.sql("SELECT cosine_sim(a, b) AS c FROM cs_vecs WHERE size(a) = 2")
      .as[Double].head()
    assert(math.abs(r - 1.0) < 1e-12)
  }

  test("interpreted eval path (no codegen) agrees too") {
    CosineSim.register(spark)
    withSQLConf("spark.sql.codegen.wholeStage" -> "false",
      "spark.sql.codegen.factoryMode" -> "NO_CODEGEN") {
      val r = vecs.select(call_function("cosine_sim", col("a"), col("b")).as("c"))
        .as[Double].collect()
      assert(math.abs(r(0) - 0.9746318461970762) < 1e-12)
      assert(r(1) === 0.0)
    }
  }

  test("zero-vector convention agrees between native and HOF paths") {
    CosineSim.register(spark)
    val zv = Seq(
      (Array(0f, 0f), Array(0f, 0f)), // cos(0,0)  = 1.0
      (Array(0f, 0f), Array(3f, 4f)), // cos(0,y)  = 0.0
      (Array(3f, 4f), Array(0f, 0f)), // cos(x,0)  = 0.0
      (Array(3f, 4f), Array(3f, 4f))  // self       = exactly 1.0
    ).toDF("a", "b")
    val out = zv.select(
      call_function("cosine_sim", col("a"), col("b")).as("native"),
      VectorFunctions.cosine(col("a"), col("b")).as("hof"))
      .as[(Double, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1.0, 0.0, 0.0, 1.0))
    assert(out.map(_._2).toSeq === Seq(1.0, 0.0, 0.0, 1.0))
  }

  test("self-cosine is exactly 1.0 (single-sqrt denominator)") {
    CosineSim.register(spark)
    // values chosen so norm² is not a perfect FP square
    val v = Seq(Tuple1(Array(0.1f, 0.2f, 0.7f, 1.3f))).toDF("a")
    val n = v.select(call_function("cosine_sim", col("a"), col("a"))).as[Double].head()
    val h = v.select(VectorFunctions.cosine(col("a"), col("a"))).as[Double].head()
    assert(n === 1.0 && h === 1.0)
  }

  test("native cosine_sim raises on vector length mismatch") {
    CosineSim.register(spark)
    val bad = Seq((Array(1f, 2f, 3f), Array(1f, 2f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(call_function("cosine_sim", col("a"), col("b"))).collect()
    }
    def messages(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x => Option(x.getMessage).toSeq ++ messages(x.getCause))
    assert(messages(e).exists(_.contains("length mismatch")))
  }

  test("FoldSelfCosine rewrites cosine_sim(x,x) to a constant") {
    CosineSim.register(spark)
    import graft.plans.FoldSelfCosine
    val before = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = before :+ FoldSelfCosine
    try {
      val df = vecs.select(call_function("cosine_sim", col("a"), col("a")).as("c"))
      val optimized = df.queryExecution.optimizedPlan.toString
      assert(!optimized.contains("cosine_sim"),
        s"expected the self-cosine to fold away, got:\n$optimized")
      // exact for every input, including the zero vector
      assert(df.as[Double].collect().toSeq === Seq(1.0, 1.0, 1.0))
      // and still exactly what the un-optimized expression computes
      spark.experimental.extraOptimizations = before
      assert(df.as[Double].collect().toSeq === Seq(1.0, 1.0, 1.0))
    } finally spark.experimental.extraOptimizations = before
  }

  private def withSQLConf[A](pairs: (String, String)*)(f: => A): A = {
    val old = pairs.map { case (k, _) => k -> spark.conf.getOption(k) }
    pairs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
