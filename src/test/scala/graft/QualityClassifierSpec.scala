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

  test("q89 REGISTERED path: scores every document, pred = prob >= 0.5, recovers the cascade (AUC)") {
    // the registry-path gate the r11 verdict asked for: execute the
    // REGISTERED query via byName (not a re-implementation), so a
    // regression in q89's own wiring — features, labels, memoization,
    // column contract — fails this suite even though the query is
    // rows-only for the DuckDB oracle
    val out = graft.queries.Registry.byName("q89_quality_classifier")
      .run(spark, docsDir).cache()
    val nDocs = Tables.documents(spark, docsDir).count()
    assert(out.count() === nDocs, "every document must be scored")
    assert(out.columns.toSeq ===
      Seq("doc_id", "label_keep", "prob_keep", "pred_keep"))
    assert(out.where(col("pred_keep") =!= (col("prob_keep") >= 0.5))
      .isEmpty, "pred_keep must be the 0.5 prob threshold")
    assert(out.where(col("prob_keep") < 0 || col("prob_keep") > 1)
      .isEmpty, "probabilities must be in [0, 1]")
    val probs = out.select(col("label_keep").cast("int"), col("prob_keep"))
      .as[(Int, Double)].collect()
    val pos = probs.filter(_._1 == 1).map(_._2)
    val neg = probs.filter(_._1 == 0).map(_._2)
    assert(pos.nonEmpty && neg.nonEmpty)
    val wins = (for (p <- pos; n <- neg)
      yield if (p > n) 1.0 else if (p == n) 0.5 else 0.0).sum
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc > 0.9, s"registered-path AUC $auc")
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

  test("rocReport: hand-computed AUC, U numerator, and best-F1 point") {
    // pos scores {10,10,5,-5}, neg scores {5,0,0,-5}
    // brute U = 8 (both 10s beat all) + 3.5 (5: tie/2 + 2 + 1) + 0.5
    //         = 12 → u2 = 24, AUC = 12/16 = 0.75
    // F1 sweep (keep iff s ≥ thr): thr=-5→6667, 0→6000, 5→7500, 10→6667
    val rows = Seq(
      (10L, true), (10L, true), (5L, true), (-5L, true),
      (5L, false), (0L, false), (0L, false), (-5L, false))
      .toDF("score4", "keep")
    val out = graft.operators.QualityClassifier
      .rocReport(rows, "score4", "keep")
      .select("n_pos", "n_neg", "u2", "auc4", "best_thr", "best_f14")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((4L, 4L, 24L, 7500L, 5L, 7500L)))
  }

  test("rocReport: F1 ties resolve to the largest threshold") {
    // pos {5,5,0,0}, neg {0,0,0,0}:
    //   thr=0 → tp=4 fp=4 → 8/12;  thr=5 → tp=2 fp=0 → 4/6 — same F1,
    // so best_thr must be the larger threshold (smaller predicted set)
    val rows = (Seq(5L, 5L, 0L, 0L).map((_, true)) ++
      Seq(0L, 0L, 0L, 0L).map((_, false))).toDF("score4", "keep")
    val out = graft.operators.QualityClassifier
      .rocReport(rows, "score4", "keep")
      .select("u2", "auc4", "best_thr", "best_f14")
      .as[(Long, Long, Long, Long)].collect().toSeq
    // u2: s=0 cell 2·(0+4)=8; s=5 cell 2·(2·4)=16 → 24; AUC = 24/32
    assert(out === Seq((24L, 7500L, 5L, 6667L)))
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

  test("conformalGate: exact order-statistic threshold, k<1 passes everything") {
    import graft.operators.QualityClassifier
    // calib positives score 1..10 → n=10, k = ⌊1000·11/10000⌋ = 1 →
    // threshold = 1st smallest = 1. Test split: positives at scores
    // 0 (missed) and 5 (covered), negative at 7 (flagged).
    val rows = Seq(
      // (score, label, calib)
      (1L, true, true), (2L, true, true), (3L, true, true),
      (4L, true, true), (5L, true, true), (6L, true, true),
      (7L, true, true), (8L, true, true), (9L, true, true),
      (10L, true, true), (99L, false, true),       // calib negative ignored
      (0L, true, false), (5L, true, false), (7L, false, false)
    ).toDF("s", "keep", "calib")
    val out = QualityClassifier.conformalGate(rows, "s", "keep", "calib",
        cov4 = 9000L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    // covered: score5 yes, score0 no → 1/2 = 5000; flagged: 5,7 → 2/3
    assert(out === ((10L, 1L, 3L, 2L, 1L, 5000L, 2L, 6667L)))
    // 5 calib positives → k = ⌊1000·6/10000⌋ = 0 → thr = −2⁶³, every
    // test row passes the gate (the guarantee-at-any-price branch)
    val tiny = Seq((3L, true, true), (4L, true, true), (5L, true, true),
      (6L, true, true), (7L, true, true),
      (-100L, true, false), (2L, false, false))
      .toDF("s", "keep", "calib")
    val o2 = QualityClassifier.conformalGate(tiny, "s", "keep", "calib",
        cov4 = 9000L)
      .as[(Long, Long, Long, Long, Long, Long, Long, Long)].collect().head
    assert(o2 === ((5L, Long.MinValue, 2L, 1L, 1L, 10000L, 2L, 10000L)))
  }
}
