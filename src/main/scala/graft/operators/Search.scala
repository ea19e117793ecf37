package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Full-text search over the corpus: positional inverted index (the
  * posting-list table a search engine materializes once per corpus)
  * and the two canonical consumers — exact phrase matching by
  * positional intersection and BM25 ranked retrieval.
  *
  * The index split mirrors the ANN family's train/assign/probe: build
  * [[positionalPostings]] once (write-time artifact, partitioned by
  * term at 100 TB), then every query touches only its own terms'
  * posting lists — never the corpus.
  */
object Search {

  /** The positional inverted index in long format: (id, pos, term) —
    * one explode of the shared tokenized frame. At scale this is
    * written once partitioned/bucketed by term so a query's posting
    * lists are a few partition reads. */
  def positionalPostings(toks: DataFrame): DataFrame =
    toks.select(col("id"), posexplode(col("ws")).as(Seq("pos", "term")))

  /** Exact phrase occurrences per doc by positional intersection:
    * join the phrase words' posting lists on (id, pos − offset) — the
    * classic search-engine phrase algorithm. Each join input is one
    * term's posting list (pre-filtered, tiny vs the corpus); the join
    * keys on (id, pos) so candidates co-locate. Returns
    * (id, n_occurrences) for docs containing the phrase. */
  def phraseOccurrences(postings: DataFrame, phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one word")
    val first = postings.where(col("term") === phrase.head)
      .select(col("id"), col("pos"))
    phrase.zipWithIndex.tail.foldLeft(first) { case (acc, (w, i)) =>
      acc.join(postings.where(col("term") === w)
          .select(col("id"), (col("pos") - i).as("pos")),
        Seq("id", "pos"))
    }.groupBy(col("id")).agg(count(lit(1)).as("n_occurrences"))
  }

  /** Reciprocal-rank fusion (Cormack et al. 2009) of any number of
    * rankings: score(d) = Σ_r 1/(k + rank_r(d)), the standard way to
    * merge heterogeneous retrievers (BM25 × dense ANN) without score
    * calibration. Each input carries (id, rn); docs missing from a
    * ranking simply contribute nothing.
    *
    * Engine-exact: each part is quantized to round(1e9/(k+rn)) — an
    * integer — so the per-doc sum is order-independent at any ranker
    * count and the final score (sum/1e9) is one exact division.
    * Ranker outputs are top-N-sized, so the union + keyed sum is
    * candidate-sized work, not corpus-sized. */
  def rrfFuse(rankings: Seq[DataFrame], k: Int = 60): DataFrame = {
    require(rankings.nonEmpty, "need at least one ranking")
    rankings.map(_.select(col("id"),
        round(lit(1e9) / (col("rn") + k)).cast("long").as("rrf9")))
      .reduce(_ unionAll _)
      .groupBy(col("id"))
      .agg((sum(col("rrf9")) / lit(1e9)).as("rrf_score"))
  }

  /** BM25 ranked retrieval (Robertson–Spärck Jones):
    * score(d) = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1−b + b·len/avgLen)).
    * Only the query terms' postings are touched (an `isin` filter
    * before any aggregate — at scale, partition pruning on the stored
    * index); df/N/avgLen are 1-row or vocabulary-sized broadcasts, and
    * the corpus never shuffles.
    *
    * Engine-exact: each (doc, term) score part is quantized to a 1e-4
    * fixed-point LONG before the per-doc sum (the unigramLogProb
    * idiom — integer sums are order-independent, and the grid absorbs
    * libm ln ulps), so the final score sum4/1e4 is bit-identical in
    * any engine. Derived constants (k1+1, 1−b) must be rendered from
    * the same doubles on the oracle side. */
  def bm25(toks: DataFrame, query: Seq[String],
           k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val lens = toks.select(col("id"), size(col("ws")).cast("long").as("len"))
    val tf = toks.select(col("id"), explode(col("ws")).as("term"))
      .where(col("term").isin(query: _*))
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val tot = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sl"))
    tf.join(broadcast(dft), "term")
      .join(lens, "id")
      .crossJoin(broadcast(tot))
      .withColumn("avglen", col("sl").cast("double") / col("n"))
      .withColumn("idf",
        log((col("n").cast("double") - col("df") + 0.5) / (col("df") + 0.5)))
      .withColumn("part4", round(
        col("idf") * (col("tf") * lit(k1 + 1)) /
          (col("tf") + lit(k1) * (lit(1 - b) + lit(b) * col("len") / col("avglen")))
          * lit(1e4)).cast("long"))
      .groupBy(col("id"))
      .agg((sum(col("part4")) / lit(1e4)).as("score"))
  }
}
