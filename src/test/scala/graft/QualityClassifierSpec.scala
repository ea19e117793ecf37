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
}
