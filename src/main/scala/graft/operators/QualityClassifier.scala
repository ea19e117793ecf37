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
}
