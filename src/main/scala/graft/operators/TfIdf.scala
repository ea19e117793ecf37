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
    hashedTfFromTerms(
      toks.select(col("id"), explode(col("ws")).as("term")), buckets)

  /** [[hashedTf]] over an already-exploded `(id, term)` occurrence
    * frame — the hook for richer feature units (word n-grams via
    * [[graft.plans.WordNgrams]], chunks, skip-grams). Feature-unit
    * choice is the SCALE lever of every sparse-similarity consumer:
    * the per-feature document frequency — hence the inverted-index
    * join fan-out — is set by how selective the unit is, not by the
    * bucket count (hashing a tiny unigram vocabulary into many
    * buckets still yields df ≈ N stop-features; 3-gram units keep df
    * small on any natural corpus). */
  def hashedTfFromTerms(terms: DataFrame, buckets: Int): DataFrame = {
    // the bucket comes from 16 md5 bits, so a larger request would
    // silently top out at 65536 occupied features (and skew occupancy
    // for non-divisors) — fail loudly instead
    require(buckets >= 1 && buckets <= 65536,
      s"buckets must be in [1, 65536] (16 md5 bits), got $buckets")
    terms
      .select(col("id"),
        (conv(substring(md5(col("term")), 1, 4), 16, 10)
          .cast("int") % buckets).as("f"))
      .groupBy(col("id"), col("f"))
      .agg(count(lit(1)).as("tf"))
  }

  /** DuckDB SQL for the same md5 feature bucket (cross-engine parity
    * with [[hashedTf]]). */
  def hashedBucketSql(term: String, buckets: Int): String =
    s"(('0x' || substr(md5($term), 1, 4))::INT % $buckets)"

  /** Dense document embedding from hashed term counts: the JL ±1 sign
    * projection ([[graft.plans.JlProject.signs]]) applied directly to
    * the SPARSE [[hashedTf]] vector — y_j = (Σ_f sign(j,f)·tf_f)/√dimOut
    * — without ever materializing the `buckets`-wide dense vector. The
    * cheap model-free text embedding: hash + project, then the dense
    * ANN stack (cosine near-dups, IVF, PQ) applies to plain text.
    *
    * Per (doc, feature) row: one sign-array lookup per output dim, then
    * a (id, j)-keyed LONG sum — map-side combined, order-independent,
    * so y (an integer over √dimOut) is bit-exact in any engine. Long
    * format (id, j, y). */
  def hashedDocEmbedding(vectors: DataFrame, buckets: Int,
                         dimOut: Int): DataFrame = {
    val signs = graft.plans.JlProject.signs(dimOut, buckets)
    val contribs = (0 until dimOut).map { j =>
      element_at(typedLit(signs(j).toSeq), col("f") + 1) * col("tf")
    }
    vectors.select(col("id"),
        posexplode(array(contribs: _*)).as(Seq("j", "c")))
      .groupBy(col("id"), col("j"))
      .agg(sum(col("c")).as("s"))
      .select(col("id"), col("j"),
        (col("s").cast("double") / lit(math.sqrt(dimOut.toDouble))).as("y"))
  }

  /** DuckDB SQL fragment for one [[hashedDocEmbedding]] contribution:
    * sign-list literal indexed by the feature column. */
  def docEmbeddingSignSql(f: String, buckets: Int, dimOut: Int,
                          j: Int): String = {
    val signs = graft.plans.JlProject.signs(dimOut, buckets)
    signs(j).mkString("([", ", ", s"])[$f + 1]")
  }

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
