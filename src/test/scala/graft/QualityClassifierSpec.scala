package graft

import graft.operators.{QualityClassifier, TextStats}
import org.apache.spark.sql.functions._

/** Learned quality filter: the classifier must recover the cascade's
  * decision boundary from the signal features (weak-label bootstrap)
  * and be fully deterministic. */
class QualityClassifierSpec extends SparkSpec {
  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.001"

  private def scored() = {
    val docs = Tables.documents(spark, docsDir)
    val stats = TextStats.repetitionStats(docs, "doc_id", "text")
      .select(col("id").as("doc_id"), col("n_tokens"),
        col("frac_distinct"), col("top_bigram_frac"))
    val labels = TextStats.qualityCascade(docs, "doc_id", "text")
      .select(col("id").as("doc_id"), col("keep").cast("int").as("label_keep"))
    QualityClassifier.trainAndScore(stats.join(labels, "doc_id"), "doc_id",
      Seq("n_tokens", "frac_distinct", "top_bigram_frac"), "label_keep")
  }

  test("classifier separates cascade verdicts from their own signals (AUC)") {
    val out = scored().cache()
    val both = out.groupBy("label_keep").count().count()
    assert(both === 2, "fixture must contain both verdicts")
    // AUC via the Wilcoxon/Mann-Whitney identity over prob_keep ranks
    val probs = out.select(col("label_keep"), col("prob_keep"))
      .as[(Int, Double)].collect()
    val pos = probs.filter(_._1 == 1).map(_._2)
    val neg = probs.filter(_._1 == 0).map(_._2)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc > 0.9, s"AUC $auc")
    out.unpersist()
  }

  test("training and scoring are deterministic") {
    val a = scored().select("doc_id", "prob_keep")
      .as[(Long, Double)].collect().toMap
    val b = scored().select("doc_id", "prob_keep")
      .as[(Long, Double)].collect().toMap
    assert(a === b)
  }

  test("bernoulliNb: hand-computed counts, parts, and verdicts") {
    // 4 docs, one feature: x perfectly predicts y
    val f = Seq(
      (1L, true, true), (2L, true, true),
      (3L, false, false), (4L, false, false)).toDF("id", "x", "y")
    val out = graft.operators.QualityClassifier
      .bernoulliNb(f, "id", Seq("x"), "y")
      .select("id", "score4", "pred_keep")
      .as[(Long, Long, Boolean)].collect().sortBy(_._1).toSeq
    // n1 = n0 = 2, n = 4; prior = round(1e4*(ln(3/6) - ln(3/6))) = 0
    // x=1: p1 = round(1e4*(ln(3/4) - ln(1/4))) = round(1e4*ln 3) = 10986
    // x=0: p0 = round(1e4*(ln(1/4) - ln(3/4))) = -10986
    assert(out === Seq(
      (1L, 10986L, true), (2L, 10986L, true),
      (3L, -10986L, false), (4L, -10986L, false)))
  }

  test("bernoulliNb: order-free and partitioning-free (exact cross-layout)") {
    val rows = (1L to 100L).map(i => (i, i % 3 == 0, i % 2 == 0))
    val a = graft.operators.QualityClassifier
      .bernoulliNb(rows.toDF("id", "x", "y").repartition(1),
        "id", Seq("x"), "y")
      .select("id", "score4").as[(Long, Long)].collect().toMap
    val b = graft.operators.QualityClassifier
      .bernoulliNb(rows.reverse.toDF("id", "x", "y").repartition(13),
        "id", Seq("x"), "y")
      .select("id", "score4").as[(Long, Long)].collect().toMap
    assert(a === b)
  }
}
