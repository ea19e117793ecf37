package graft

import graft.queries.Registry
import org.apache.spark.sql.functions._

/** Laws of the model-in-the-loop capstone (q92): classifier-ordered
  * selection under the token budget, then packing. */
class CurationV3Spec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Budget = 100000L
  private val MaxTok = 2048L

  private def scoredDocs() =
    graft.queries.TextQueries.q89.run(spark, dir)
      .join(Tables.documents(spark, dir).select(col("doc_id"),
        graft.functions.TextFunctions.tokenCount(col("text")).cast("long")
          .as("n_toks")), "doc_id")
      .where(col("pred_keep"))

  test("q92: budget respected, shard bound holds, selection is the model-ordered budget prefix") {
    val scored = scoredDocs()
      .select(col("doc_id"), col("n_toks"), col("prob_keep"))
      .as[(Long, Long, Double)].collect()
      .sortBy { case (id, _, p) => (-p, id) }
    assert(scored.nonEmpty)
    val maxDoc = scored.map(_._2).max

    val out = Registry.byName("q92_curation_v3").run(spark, dir)
      .as[(Long, Long, Long, Double)].collect()   // shard_id, n_docs, sum_tokens, fill
    assert(out.nonEmpty)
    assert(out.map(_._3).sum <= Budget, "total tokens exceed the budget")
    // a doc straddling a boundary packs wholly into its start shard, so
    // a shard may exceed MaxTok by at most one doc's tail
    out.foreach { case (sid, _, t, _) =>
      assert(t < MaxTok + maxDoc, s"shard $sid overfull: $t")
    }

    // selection = the maximal prefix of the (prob desc, id) ordering
    // whose running sum stays within budget (sequential ground truth)
    var cum = 0L
    val expectIds = scored.takeWhile { case (_, t, _) =>
      cum += t; cum <= Budget
    }.map(_._1).toSet
    val gotIds = graft.operators.Sampling.tokenBudgetSelect(
        scoredDocs(), "doc_id", "n_toks", "prob_keep", budget = Budget)
      .select("doc_id").as[Long].collect().toSet
    assert(gotIds === expectIds)
  }
}
