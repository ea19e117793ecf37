package graft.operators

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Model-in-the-loop quality filtering: train a logistic-regression
  * quality classifier on per-document signal features against weak
  * labels (e.g. the [[TextStats.qualityCascade]] verdicts or a curated
  * seed set), then score the whole corpus — the standard bootstrap
  * from hand heuristics to a learned filter (the fasttext-classifier
  * pattern of GPT-3/CCNet/FineWeb data pipelines), here with Spark
  * MLlib so training AND inference are the same distributed engine as
  * the feature computation.
  *
  * Scale: features come from the engine's own signal queries (keyed
  * aggregates, see q85); LBFGS training is Spark-distributed
  * (gradient = one map-reduce pass per iteration over the feature
  * frame); scoring is a pure map. Determinism: zero-init LBFGS on
  * deterministic features — no RNG anywhere — so training is
  * reproducible for a FIXED partitioning/config (the spec asserts
  * same-session run-to-run equality). It is NOT bit-identical across
  * cluster layouts: LBFGS sums per-partition double gradients, and
  * float addition order follows the partitioning. Hence q89 is
  * registered rows-only with an AUC floor rather than hash-matched.
  */
object QualityClassifier {

  /** Train on `labelCol` (0/1) over `featureCols`, score every row.
    * Nulls in features are imputed to 0 (absent signal). Returns the
    * input plus `prob_keep` (rounded to 4) and `pred_keep`. */
  def trainAndScore(features: DataFrame, idCol: String,
                    featureCols: Seq[String], labelCol: String,
                    maxIter: Int = 20, regParam: Double = 0.01): DataFrame = {
    val clean = features.na.fill(0.0, featureCols)
      .withColumn("__label", col(labelCol).cast("double"))
    val assembled = new VectorAssembler()
      .setInputCols(featureCols.toArray)
      .setOutputCol("__feat")
      .transform(clean)
    val model = new LogisticRegression()
      .setFeaturesCol("__feat").setLabelCol("__label")
      .setMaxIter(maxIter).setRegParam(regParam)
      .setStandardization(true)
      .fit(assembled)
    val prob1 = udf((v: org.apache.spark.ml.linalg.Vector) => v(1))
    model.transform(assembled)
      .withColumn("prob_keep", round(prob1(col("probability")), 4))
      .withColumn("pred_keep", col("prediction") === 1.0)
      .drop("__feat", "__label", "rawPrediction", "probability", "prediction")
  }

  /** Bernoulli Naive Bayes over BINARY feature columns — the
    * closed-form learned classifier that, unlike LBFGS, is
    * cross-engine EXACT and therefore oracle-gateable: training is
    * nothing but counts (one aggregate pass, a dozen driver longs —
    * model state like the IVF centroids), and scoring sums per-feature
    * log-likelihood-ratio PARTS that are rounded to the 1e-4
    * fixed-point grid as integers before summing (the BM25 idiom:
    * ln-ulp differences between engines are absorbed by the part
    * rounding, and integer sums are order-free). Add-one smoothing on
    * every count. Returns the input plus `score4` (integer fixed-point
    * log-odds) and `pred_keep` (score4 > 0).
    *
    * Scale: train = one map-side-partial aggregate over the corpus;
    * score = a pure map of literal comparisons — no join, no shuffle,
    * no model object. The LBFGS classifier remains the
    * higher-capacity option; this is the one you can hash-match. */
  def bernoulliNb(feats: DataFrame, idCol: String,
                  featCols: Seq[String], labelCol: String): DataFrame = {
    val aggs =
      Seq(sum(when(col(labelCol), 1L).otherwise(0L)).as("n1"),
        count(lit(1)).as("n")) ++
      featCols.zipWithIndex.flatMap { case (f, j) =>
        Seq(sum(when(col(labelCol) && col(f), 1L).otherwise(0L)).as(s"c1_$j"),
          sum(when(!col(labelCol) && col(f), 1L).otherwise(0L)).as(s"c0_$j"))
      }
    val row = feats.agg(aggs.head, aggs.tail: _*).head()
    val n1 = row.getAs[Long]("n1")
    val n = row.getAs[Long]("n")
    val n0 = n - n1
    // HALF_UP (away from zero), matching SQL round() for NEGATIVE parts
    // too — math.round is floor(x+0.5), which disagrees at exact -.5
    def part(num1: Long, den1: Long, num0: Long, den0: Long): Long =
      java.math.BigDecimal.valueOf(
          1e4 * (math.log((num1 + 1).toDouble / (den1 + 2)) -
            math.log((num0 + 1).toDouble / (den0 + 2))))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val prior = part(n1, n, n0, n)
    val score = featCols.zipWithIndex.map { case (f, j) =>
      val c1 = row.getAs[Long](s"c1_$j")
      val c0 = row.getAs[Long](s"c0_$j")
      when(col(f), lit(part(c1, n1, c0, n0)))
        .otherwise(lit(part(n1 - c1, n1, n0 - c0, n0)))
    }.reduce(_ + _) + lit(prior)
    feats.withColumn("score4", score.cast("long"))
      .withColumn("pred_keep", col("score4") > 0L)
  }

  /** Exact ROC / ranking-quality report for an integer-grid score
    * against a boolean label: one row with the tie-aware Mann–Whitney
    * AUC and the best-F1 operating point. `u2` is 2·U as an EXACT
    * integer (U = #(pos>neg pairs) + ½·#(ties)), so
    * AUC = u2 / (2·n_pos·n_neg); `auc4`/`best_f14` are 1e-4-grid
    * roundings of double ratios of exact integers (the engine-portable
    * q194 double-ratio idiom). The operating point predicts keep iff
    * score ≥ threshold; F1 ties resolve to the LARGEST threshold (the
    * smallest predicted set).
    *
    * Scale: the corpus reduces to per-score cells in one map-side-
    * partial aggregate; the cumulative window runs over the CELL spine
    * (bounded by distinct grid scores — for a k-feature NB, ≤ 2^k·k
    * cells), never the rows — the q161/q169 grid-cell discipline. */
  def rocReport(scored: DataFrame, scoreCol: String,
                labelCol: String): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val cells = scored.groupBy(col(scoreCol).as("s"))
      .agg(sum(when(col(labelCol), 1L).otherwise(0L)).as("p"),
        sum(when(!col(labelCol), 1L).otherwise(0L)).as("q"))
      .withColumn("cp_below", coalesce(sum(col("p")).over(w), lit(0L)))
      .withColumn("cq_below", coalesce(sum(col("q")).over(w), lit(0L)))
    val tot = cells.agg(sum(col("p")).as("n_pos"), sum(col("q")).as("n_neg"))
    cells.crossJoin(broadcast(tot))
      // each pos in this cell beats every neg strictly below and half-
      // wins the ties in its own cell: 2U = Σ p·(2·cq_below + q)
      .withColumn("u2_part",
        col("p") * (lit(2L) * col("cq_below") + col("q")))
      // operating point at threshold s: predict keep iff score ≥ s
      .withColumn("tp", col("n_pos") - col("cp_below"))
      .withColumn("fp", col("n_neg") - col("cq_below"))
      // F1 = 2tp/(2tp+fp+fn) with fn = n_pos − tp ⇒ 2tp/(tp+fp+n_pos)
      .withColumn("f14", round(lit(1e4) * lit(2.0) * col("tp")
        / (col("tp") + col("fp") + col("n_pos"))).cast("long"))
      .groupBy(col("n_pos"), col("n_neg"))
      .agg(sum(col("u2_part")).as("u2"),
        max(struct(col("f14"), col("s"))).as("best"))
      .select(col("n_pos"), col("n_neg"), col("u2"),
        round(lit(1e4) * col("u2")
          / (lit(2.0) * col("n_pos") * col("n_neg"))).cast("long").as("auc4"),
        col("best.s").as("best_thr"), col("best.f14").as("best_f14"))
  }

  /** Split-conformal acceptance gate (Vovk; Papadopoulos et al. '02 —
    * the distribution-free coverage recipe): from the CALIBRATION
    * split's true-keep scores, pick the threshold
    * `t = k-th smallest score, k = ⌊(1 − cov4/10⁴)·(n+1)⌋` — the exact
    * order statistic (k < 1 ⇒ the guarantee needs everything:
    * t = Long.MinValue, the pass-all sentinel). Scoring
    * `score ≥ t` on exchangeable data then covers true keeps at ≥
    * cov4/10⁴ marginally, REGARDLESS of how miscalibrated the model
    * is — the guarantee q171's calibration table can only hope for.
    * The report audits the held-out split: realized coverage and the
    * flagged fraction (the efficiency price of the guarantee).
    *
    * Scale: two score-cell censuses (cells bounded by the score grid,
    * not the data), one tiny ordered window over cells, one broadcast
    * of the 1-row threshold. Returns one row: (n_calib_pos, thr_s,
    * n_test, n_test_pos, n_covered, coverage4, n_flagged,
    * flagged_frac4). */
  def conformalGate(scored: DataFrame, scoreCol: String, labelCol: String,
                    calibCol: String, cov4: Long = 9000L): DataFrame = {
    require(cov4 >= 1 && cov4 <= 9999, "cov4 must be in [1, 9999]")
    val w = org.apache.spark.sql.expressions.Window.orderBy(col("s"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    val cells = scored.where(col(calibCol) && col(labelCol))
      .groupBy(col(scoreCol).as("s")).agg(count(lit(1)).as("n"))
      .withColumn("cum", sum(col("n")).over(w))
    val tot = cells.agg(sum(col("n")).as("np"))
      .withColumn("k",
        floor((lit(10000L) - cov4) * (col("np") + 1L) / 10000L).cast("long"))
    val thr = cells.crossJoin(broadcast(tot))
      .agg(max(col("np")).as("n_calib_pos"), max(col("k")).as("kk"),
        min(when(col("cum") >= col("k"), col("s"))).as("cand"))
      .select(col("n_calib_pos"),
        when(col("kk") < 1L, lit(Long.MinValue)).otherwise(col("cand"))
          .as("thr_s"))
    val test = scored.where(!col(calibCol))
    test.agg(count(lit(1)).as("n_test"),
        sum(when(col(labelCol), 1L).otherwise(0L)).as("n_test_pos"))
      .crossJoin(broadcast(thr))
      .crossJoin(broadcast(
        test.select(col(scoreCol).as("ts"), col(labelCol).as("tl"))
          .crossJoin(broadcast(thr.select(col("thr_s").as("t2"))))
          .agg(sum(when(col("tl") && col("ts") >= col("t2"), 1L)
            .otherwise(0L)).as("n_covered"),
            sum(when(col("ts") >= col("t2"), 1L).otherwise(0L))
              .as("n_flagged"))))
      .select(col("n_calib_pos"), col("thr_s"), col("n_test"),
        col("n_test_pos"), col("n_covered"),
        round(lit(1e4) * col("n_covered") / col("n_test_pos")).cast("long")
          .as("coverage4"),
        col("n_flagged"),
        round(lit(1e4) * col("n_flagged") / col("n_test")).cast("long")
          .as("flagged_frac4"))
  }
}
