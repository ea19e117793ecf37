package graft

import graft.syntax._
import org.apache.spark.sql.functions._

/** The public `import graft.syntax._` surface works end-to-end. */
class SyntaxSpec extends SparkSpec {
  import spark.implicits._

  test("syntax ops compose on plain DataFrames") {
    val docs = Seq(
      (1L, "alpha beta gamma delta"),
      (2L, "alpha beta gamma delta"),
      (3L, "totally unrelated text here")).toDF("doc_id", "text")

    assert(docs.dedupExact("doc_id", "text").count() === 2)
    assert(docs.nearDupPairs("doc_id", "text", minJaccard = 0.9)
      .select("id_a", "id_b").as[(Long, Long)].head() === ((1L, 2L)))
    assert(docs.withLangId("text").columns.contains("lang_pred"))
    assert(docs.withTokenCount("text")
      .where(col("doc_id") === 1).select("n_tokens").as[Int].head() === 4)

    val vecs = Seq((0L, Array(1f, 0f)), (1L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val knn = vecs.cosineTopK(vecs.where(col("vec_id") === 0), "vec_id", "embedding",
      k = 1, dim = 2)
    assert(knn.select("corpus_id").as[Long].head() === 1L)
  }
}
