package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Full-text search over the corpus: positional inverted index (the
  * posting-list table a search engine materializes once per corpus)
  * and the two canonical consumers — exact phrase matching by
  * positional intersection and BM25 ranked retrieval.
  *
  * The index split mirrors the ANN family's train/assign/probe: build
  * [[positionalPostings]] once — [[writePostings]] materializes it on
  * disk, parquet-partitioned by md5 term bucket — then every query
  * ([[phraseFromPostings]], [[bm25FromPostings]]) partition-prunes to
  * its own terms' posting lists and never touches the corpus.
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
    * Only the query terms' postings are aggregated (an `isin` filter
    * before any aggregate — on the stored index ([[bm25FromPostings]]),
    * bucket-partition pruning); df/N/avgLen are 1-row or
    * vocabulary-sized broadcasts. The corpus-row-count doc-length side
    * is probed, never shuffled: the matching-docs tf frame is the
    * explicitly-hinted broadcast side of that join (see [[bm25Score]]).
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
    val tot = lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sl"))
    bm25Score(tf, lens, tot, k1, b)
  }

  /** Pseudo-relevance-feedback retrieval (the Rocchio/RM3 shape):
    * run [[bm25]], take the top `fbDocs` results as implicit
    * relevance, mine the `fbTerms` strongest expansion terms from them
    * (tf-idf-weighted on the integer grid — corpus-ubiquitous terms
    * weigh ~0 via ln(N/df), so no stopword list is needed; original
    * query terms excluded), and re-run BM25 with the expanded query.
    * Classic recall lever when the original query is underspecified.
    *
    * The expansion term list is collected to the driver — `fbTerms`
    * strings, model-state-sized like IVF centroids, never corpus
    * data; everything else is the two BM25 passes' own shapes. */
  def bm25Prf(toks: DataFrame, query: Seq[String], fbDocs: Int = 5,
              fbTerms: Int = 4, k1: Double = 1.2, b: Double = 0.75)
      : DataFrame = {
    require(fbDocs >= 1 && fbTerms >= 0, "fbDocs >= 1, fbTerms >= 0")
    val first = bm25(toks, query, k1, b)
      .orderBy(col("score").desc, col("id")).limit(fbDocs)
      .select(col("id"))
    val fbTf = toks.join(first, Seq("id"), "left_semi")
      .select(explode(col("ws")).as("term"))
      .where(!col("term").isin(query: _*))
      .groupBy("term").agg(count(lit(1)).as("c_fb"))
    val corpusDf = toks
      .select(col("id"), explode(array_distinct(col("ws"))).as("term"))
      .groupBy("term").agg(count(lit(1)).as("df"))
    val nDocs = toks.agg(count(lit(1)).as("n"))
    val expansion = fbTf.join(corpusDf, "term")
      .crossJoin(broadcast(nDocs))
      .withColumn("wt4", round(lit(1e4) * col("c_fb")
        * log(col("n").cast("double") / col("df"))).cast("long"))
      .orderBy(col("wt4").desc, col("term")).limit(fbTerms)
      .select("term").collect().map(_.getString(0)).toSeq
    bm25(toks, query ++ expansion, k1, b)
  }

  /** Best-window snippet extraction: for every document containing a
    * query term, the `width`-token window that maximizes (distinct
    * query terms, then total matches, then earliest start) — what a
    * result page actually shows under each hit. Candidate windows
    * start AT a match position (an optimal window can always be slid
    * left onto one), so the per-doc work is O(m²) in the doc's MATCH
    * count — posting-bounded, never token-bounded; the snippet text
    * itself is one array slice of the already-tokenized row. */
  def snippets(toks: DataFrame, query: Seq[String],
               width: Int = 12): DataFrame = {
    require(query.nonEmpty && width >= 1, "need query terms and width >= 1")
    val pos = toks
      .select(col("id"), posexplode(col("ws")).as(Seq("pos", "tok")))
      .where(col("tok").isin(query: _*))
    val scored = pos.select(col("id"), col("pos").as("start"))
      .join(pos, Seq("id"))
      .where(col("pos") >= col("start") && col("pos") < col("start") + width)
      .groupBy("id", "start")
      .agg(countDistinct(col("tok")).as("n_terms"),
        count(lit(1)).as("n_matches"))
    val w = org.apache.spark.sql.expressions.Window.partitionBy(col("id"))
      .orderBy(col("n_terms").desc, col("n_matches").desc, col("start"))
    scored.withColumn("rn", row_number().over(w)).where(col("rn") === 1)
      .join(toks, Seq("id"))
      .select(col("id"), col("start"), col("n_terms"), col("n_matches"),
        array_join(slice(col("ws"), col("start") + 1, lit(width)), " ")
          .as("snippet"))
  }

  /** Shared BM25 scoring tail: `tf` = (id, term, tf) over matching docs
    * only, `lens` = (id, len) for EVERY doc, `tot` = 1 row (n, sl).
    * The tf side is matching-docs-sized (bounded by the query's
    * posting lists), so it is the EXPLICIT broadcast side of the join
    * against the corpus-row-count `lens` — without the hint, a stats
    * mis-estimate could flip this into a corpus-wide shuffle. (A
    * stop-word query would inflate tf toward corpus size; BM25 over
    * pure stop-words is degenerate — idf ≈ 0 — so that shape is a
    * caller bug, not a plan this optimizes for.) */
  /** Dirichlet-smoothed query-likelihood retrieval — the language-model
    * ranking family beside [[bm25]] (Zhai & Lafferty's QL; the other
    * standard lexical baseline). Scored in the matching-terms
    * decomposition so per-doc work is bounded by MATCHED terms:
    * score(d) = Σ_{t∈q, tf>0} ln(1 + tf·C / (μ·cf_t))
    *          + |q|·ln(μ / (len_d + μ)),
    * with cf_t the collection frequency and C total corpus tokens —
    * every document scores (the second term alone for zero-match
    * docs), which is what distinguishes QL's length prior from BM25's
    * matched-only scoring. Both addends snap to the 1e-4 grid as
    * integers before the order-free sum (the BM25 part idiom). Query
    * terms absent from the corpus contribute only the length prior
    * (their matched part has no rows).
    *
    * Scale: one tf aggregate over query terms, broadcast cf/total
    * model state, then a pure map over doc lengths — same shapes as
    * [[bm25]] plus the per-doc prior. */
  def queryLikelihood(toks: DataFrame, query: Seq[String],
                      mu: Double = 2000.0): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val lens = toks.select(col("id"), size(col("ws")).cast("long").as("len"))
    val hits = toks.select(col("id"), explode(col("ws")).as("term"))
      .where(col("term").isin(query: _*))
    val cf = hits.groupBy(col("term")).agg(count(lit(1)).as("cf"))
    val ctot = lens.agg(sum(col("len")).as("c"))
    val matched = hits.groupBy(col("id"), col("term"))
      .agg(count(lit(1)).as("tf"))
      .join(broadcast(cf), "term")
      .crossJoin(broadcast(ctot))
      .withColumn("part4", round(lit(1e4) * log(lit(1.0)
        + (col("tf").cast("double") * col("c"))
          / (lit(mu) * col("cf").cast("double")))).cast("long"))
      .groupBy(col("id")).agg(sum(col("part4")).as("m4"))
    lens.join(matched, Seq("id"), "left")
      .withColumn("d4", round(lit(1e4) * lit(query.size.toDouble)
        * log(lit(mu) / (col("len") + lit(mu)))).cast("long"))
      .select(col("id"),
        ((coalesce(col("m4"), lit(0L)) + col("d4")) / lit(1e4)).as("score"))
  }

  private[graft] def bm25Score(tf: DataFrame, lens: DataFrame, tot: DataFrame,
                               k1: Double, b: Double): DataFrame = {
    val dft = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    broadcast(tf.join(broadcast(dft), "term"))
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

  // ------------------------------------------------ stored index

  /** Retrieval-quality evaluation of ANY ranking against a relevance
    * set: per query, hits@k, the rank of the first relevant result
    * (MRR numerator), and binary-relevance nDCG@k — the metrics a
    * retrieval pipeline regression-gates on. `ranked` carries
    * (query_id, corpus_id, rn); `relevant` the (query_id, corpus_id)
    * truth pairs. Queries with NO relevant documents are excluded
    * (nothing to measure); queries whose top-k contains no relevant
    * document score 0.
    *
    * Cross-engine exactness: every log2 discount is snapped to the
    * 1e-4 integer grid BEFORE summing (`round(1e4 / log2(rank+1))` —
    * the BM25/RRF idiom), so DCG and ideal-DCG are order-free integer
    * sums and `ndcg` is one final division of two integers. Scale:
    * joins are (queries × k)- and truth-set-sized — never corpus-sized;
    * the ideal-DCG prefix is a per-row bounded HOF over ≤ k terms. */
  def evalRanked(ranked: DataFrame, relevant: DataFrame, k: Int): DataFrame = {
    require(k >= 1, "k must be >= 1")
    val disc: Column => Column =
      r => round(lit(1e4) / log2(r + lit(1))).cast("long")
    val nrel = relevant.groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_rel"))
    val perQ = ranked.where(col("rn") <= k)
      .join(relevant.withColumn("rel", lit(1)),
        Seq("query_id", "corpus_id"), "left")
      .groupBy(col("query_id"))
      .agg(
        sum(when(col("rel").isNotNull, 1L).otherwise(0L)).as("n_rel_at_k"),
        min(when(col("rel").isNotNull, col("rn"))).as("fr"),
        sum(when(col("rel").isNotNull, disc(col("rn"))).otherwise(0L))
          .as("dcg4"))
    perQ.join(nrel, Seq("query_id"))
      .withColumn("idcg4",
        aggregate(sequence(lit(1), least(col("n_rel"), lit(k))),
          lit(0L), (acc, i) => acc + disc(i)))
      .select(col("query_id"), col("n_rel_at_k"),
        coalesce(col("fr"), lit(0)).as("first_rel_rank"),
        coalesce(round(lit(1e4) / col("fr")).cast("long"), lit(0L))
          .as("mrr4"),
        col("dcg4"), col("idcg4"),
        round(col("dcg4").cast("double") / col("idcg4"), 4).as("ndcg"))
  }

  /** Scala-side term bucket — the SAME 16-md5-bit value as the `tb`
    * column [[writePostings]] writes (the [[TfIdf.hashedTfFromTerms]]
    * convention), so a reader derives a query's partition set without
    * touching the index. */
  def termBucket(term: String, buckets: Int): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(term.getBytes("UTF-8"))
    (((d(0) & 0xff) << 8) | (d(1) & 0xff)) % buckets
  }

  /** Write the positional index as the on-disk artifact the scaladocs
    * promise — the search-family sibling of [[Similarity.ivfSave]]:
    *
    *   - `path/postings` — (id, pos, term), parquet PARTITIONED BY the
    *     md5 term bucket `tb`, so a query reads only its own terms'
    *     buckets (directory-level partition pruning; `buckets` bounds
    *     directory count where raw `partitionBy(term)` would create one
    *     directory per vocabulary word).
    *   - `path/doclens` — (id, len) for every doc (BM25 normalization).
    *   - `path/stats` — 1 row (n, sl, buckets): corpus totals captured
    *     at build time plus the bucket count readers must reuse.
    *
    * Build cost is one corpus explode + shuffle-free write; each query
    * thereafter is posting-list-sized, never corpus-sized. */
  def writePostings(toks: DataFrame, path: String, buckets: Int = 64): Unit = {
    require(buckets >= 1 && buckets <= 65536,
      s"buckets must be in [1, 65536] (16 md5 bits), got $buckets")
    val lens = toks.select(col("id"), size(col("ws")).cast("long").as("len"))
    positionalPostings(toks)
      .withColumn("tb",
        (conv(substring(md5(col("term")), 1, 4), 16, 10).cast("int") % buckets))
      .write.mode("overwrite").partitionBy("tb").parquet(s"$path/postings")
    lens.write.mode("overwrite").parquet(s"$path/doclens")
    lens.agg(count(lit(1)).as("n"), sum(col("len")).as("sl"))
      .withColumn("buckets", lit(buckets))
      .coalesce(1).write.mode("overwrite").parquet(s"$path/stats")
  }

  /** The stored-index stats row: (n docs, sum of lengths, buckets). */
  private def readStats(spark: org.apache.spark.sql.SparkSession,
                        path: String): (Long, Long, Int) = {
    val r = spark.read.parquet(s"$path/stats")
      .select(col("n"), col("sl"), col("buckets")).head()
    (r.getLong(0), r.getLong(1), r.getInt(2))
  }

  /** The query terms' posting lists from a [[writePostings]] index:
    * the `tb.isin(...)` predicate is a PARTITION filter (computed
    * driver-side via [[termBucket]]), so the scan touches only the
    * terms' bucket directories; the residual `term.isin` prunes within
    * a shared bucket. */
  def postingsFor(spark: org.apache.spark.sql.SparkSession, path: String,
                  terms: Seq[String]): DataFrame = {
    require(terms.nonEmpty, "need at least one term")
    val (_, _, buckets) = readStats(spark, path)
    val tbs = terms.map(termBucket(_, buckets)).distinct
    spark.read.parquet(s"$path/postings")
      .where(col("tb").isin(tbs: _*) && col("term").isin(terms: _*))
      .select(col("id"), col("pos"), col("term"))
  }

  /** [[phraseOccurrences]] over a stored index — reads only the phrase
    * words' bucket partitions. Result ≡ the in-memory path. */
  def phraseFromPostings(spark: org.apache.spark.sql.SparkSession,
                         path: String, phrase: Seq[String]): DataFrame =
    phraseOccurrences(postingsFor(spark, path, phrase.distinct), phrase)

  /** [[bm25]] over a stored index: tf re-aggregates the pruned posting
    * lists, doc lengths come from `path/doclens`, totals from the
    * build-time stats row — so scores are IDENTICAL to the in-memory
    * path while the query never rescans (or shuffles) the corpus. */
  def bm25FromPostings(spark: org.apache.spark.sql.SparkSession,
                       path: String, query: Seq[String],
                       k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(query.nonEmpty, "query must have at least one term")
    val tf = postingsFor(spark, path, query.distinct)
      .groupBy(col("id"), col("term")).agg(count(lit(1)).as("tf"))
    val lens = spark.read.parquet(s"$path/doclens")
      .select(col("id"), col("len"))
    val tot = spark.read.parquet(s"$path/stats")
      .select(col("n"), col("sl"))
    bm25Score(tf, lens, tot, k1, b)
  }
}
