package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** TF-IDF over a document corpus (SURVEY.md §2.2 text-analysis row):
  * term frequency per doc × ln(N/df) inverse document frequency, with
  * top-k term extraction per document.
  *
  * Scale shape: two hash aggregates (doc×term, term) + a broadcast of
  * the (tiny) corpus-size scalar + a per-doc window top-k. The df table
  * is vocabulary-sized — broadcastable for any real vocabulary; the
  * doc×term frame shuffles once on term for the idf join, once on doc
  * for the top-k window.
  */
object TfIdf {

  /** (doc, term, tf, df, tfidf) for every term occurrence. */
  def termScores(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val tok = docs.select(col(idCol).as("doc"),
      explode(TextFunctions.tokens(col(textCol))).as("term"))
    val tf = tok.groupBy("doc", "term").agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    val n = docs.select(countDistinct(col(idCol)).as("n_docs"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(n))
      .withColumn("tfidf", col("tf") * log(col("n_docs").cast("double") / col("df")))
  }

  /** Feature-hashed term-frequency vectors in long format
    * (id, f, tf): each token maps to one of `buckets` features by
    * md5 (first 16 bits mod buckets — the same cross-engine-exact
    * bucketing as [[Sampling]]), counts aggregated per (doc, bucket).
    * The hashing-trick bag-of-words: a FIXED feature space regardless
    * of vocabulary, so downstream consumers (sparse cosine, linear
    * models) never need a vocabulary broadcast. One map + one
    * (id, f)-keyed aggregate, partials map-side combined.
    *
    * Input is a pre-tokenized `(id, ws)` frame
    * ([[TextStats.tokenized]]) so the corpus-wide token pass is
    * shared with every other token consumer. */
  def hashedTf(toks: DataFrame, buckets: Int): DataFrame =
    toks.select(col("id"), explode(col("ws")).as("term"))
      .select(col("id"),
        (conv(substring(md5(col("term")), 1, 4), 16, 10)
          .cast("int") % buckets).as("f"))
      .groupBy(col("id"), col("f"))
      .agg(count(lit(1)).as("tf"))

  /** DuckDB SQL for the same md5 feature bucket (cross-engine parity
    * with [[hashedTf]]). */
  def hashedBucketSql(term: String, buckets: Int): String =
    s"(('0x' || substr(md5($term), 1, 4))::INT % $buckets)"

  /** Top-k highest-tfidf terms per document (deterministic tie-break on
    * the term itself). */
  def topTerms(docs: DataFrame, idCol: String, textCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("tfidf").desc, col("term"))
    termScores(docs, idCol, textCol)
      .withColumn("rn", row_number().over(w))
      .where(col("rn") <= k)
      .select(col("doc"), col("term"), round(col("tfidf"), 6).as("tfidf"), col("rn"))
  }
}
