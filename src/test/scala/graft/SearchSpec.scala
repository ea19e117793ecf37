package graft

import graft.operators.Search
import org.apache.spark.sql.functions._

/** Search-index operators: postings-based phrase matching proved
  * against the n-gram path on the real corpus, and BM25 ranking laws
  * on a hand-built corpus. */
class SearchSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  private lazy val toks = graft.operators.TextStats
    .tokenized(Tables.documents(spark, dir), "doc_id", "text").cache()

  test("phrase occurrences via postings ≡ trigram-equality counts over the whole corpus") {
    graft.plans.WordNgrams.register(spark)
    val phrase = Seq("big", "order", "scan")
    val viaPostings = Search.phraseOccurrences(
        Search.positionalPostings(toks), phrase)
      .select(col("id").cast("long"), col("n_occurrences"))
      .as[(Long, Long)].collect().toMap
    val viaNgrams = toks
      .select(col("id"), explode(call_function(
        graft.plans.WordNgrams.fnName, col("ws"), lit(3), lit(1))).as("g"))
      .where(col("g") === phrase.mkString(" "))
      .groupBy(col("id")).agg(count(lit(1)).as("n"))
      .select(col("id").cast("long"), col("n"))
      .as[(Long, Long)].collect().toMap
    assert(viaPostings == viaNgrams)
    assert(viaPostings.nonEmpty, "fixture phrase must occur")
  }

  test("phrase matching requires adjacency and order") {
    val t = Seq(
      (1L, Seq("a", "b", "c")),      // match
      (2L, Seq("a", "x", "b", "c")), // a not adjacent — b c alone no match
      (3L, Seq("c", "b", "a")),      // reversed
      (4L, Seq("a", "b", "a", "b", "c")) // one match at pos 2
    ).toDF("id", "ws")
    val hits = Search.phraseOccurrences(
        Search.positionalPostings(t), Seq("a", "b", "c"))
      .select(col("id").cast("long"), col("n_occurrences"))
      .as[(Long, Long)].collect().toMap
    assert(hits == Map(1L -> 1L, 4L -> 1L))
  }

  test("BM25: rarer query terms dominate; longer docs with equal tf score lower") {
    // 10 docs with "common", only 1 with "rare"
    val docs = (1L to 10L).map { i =>
      val base = Seq("common") ++ Seq.fill(5)("filler" + i)
      (i, if (i == 1) base :+ "rare" else base)
    }.toDF("id", "ws")
    val scores = Search.bm25(docs, Seq("common", "rare"))
      .select(col("id").cast("long"), col("score"))
      .as[(Long, Double)].collect().toMap
    assert(scores(1L) > scores(2L), "doc with the rare term must outrank")
    // same tf, different doc length → shorter doc scores higher. The
    // corpus needs enough q-free docs that idf("q") stays positive
    // (RSJ idf is negative once df > N/2, which would flip the law)
    val lenDocs = (Seq(
      (1L, Seq("q", "p")),
      (2L, Seq("q") ++ Seq.fill(30)("pad"))) ++
      (3L to 10L).map(i => i -> Seq("other", "words"))).toDF("id", "ws")
    val s2 = Search.bm25(lenDocs, Seq("q"))
      .select(col("id").cast("long"), col("score"))
      .as[(Long, Double)].collect().toMap
    assert(s2(1L) > s2(2L), "length normalization must penalize the padded doc")
  }

  test("RRF: appearing in both rankings beats the same best rank in one; parts are exact integers") {
    val r1 = Seq((10L, 1), (20L, 2), (30L, 3)).toDF("id", "rn")
    val r2 = Seq((20L, 1), (40L, 2)).toDF("id", "rn")
    val fused = Search.rrfFuse(Seq(r1, r2), k = 60)
      .select(col("id").cast("long"), col("rrf_score"))
      .as[(Long, Double)].collect().toMap
    // doc 20 (ranks 2 and 1) must beat doc 10 (rank 1 only)
    assert(fused(20L) > fused(10L))
    // exact values: round(1e9/61)=16393443, round(1e9/62)=16129032
    assert(fused(10L) == 16393443 / 1e9)
    assert(fused(20L) == (16129032L + 16393443L) / 1e9)
    assert(fused.keySet == Set(10L, 20L, 30L, 40L))
  }

  private lazy val indexPath = {
    val p = java.nio.file.Files.createTempDirectory("graft-searchspec-").toString
    Search.writePostings(toks, p, buckets = 64)
    p
  }

  test("stored index: phrase + BM25 answer IDENTICALLY to the in-memory path") {
    val phrase = Seq("big", "order", "scan")
    val viaMem = Search.phraseOccurrences(Search.positionalPostings(toks), phrase)
      .select(col("id").cast("long"), col("n_occurrences"))
      .as[(Long, Long)].collect().toMap
    val viaDisk = Search.phraseFromPostings(spark, indexPath, phrase)
      .select(col("id").cast("long"), col("n_occurrences"))
      .as[(Long, Long)].collect().toMap
    assert(viaDisk == viaMem && viaDisk.nonEmpty)
    val terms = Seq("dup", "sort", "batch")
    val bmMem = Search.bm25(toks, terms)
      .select(col("id").cast("long"), col("score"))
      .as[(Long, Double)].collect().toMap
    val bmDisk = Search.bm25FromPostings(spark, indexPath, terms)
      .select(col("id").cast("long"), col("score"))
      .as[(Long, Double)].collect().toMap
    // bit-exact: scores are 1e-4 fixed-point integer sums in both paths
    assert(bmDisk == bmMem && bmDisk.nonEmpty)
  }

  test("stored index: the postings scan partition-prunes on the term bucket") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val df = Search.bm25FromPostings(spark, indexPath, Seq("dup", "sort", "batch"))
    val scans = df.queryExecution.sparkPlan.collect {
      case f: FileSourceScanExec if f.output.exists(_.name == "term") => f
    }
    assert(scans.nonEmpty, "postings file scan must appear in the plan")
    assert(scans.forall(_.partitionFilters.exists(
        _.references.exists(_.name == "tb"))),
      s"every postings scan must carry a tb partition filter:\n${df.queryExecution}")
    // and the query's 3 terms can touch at most 3 of the 64 bucket dirs
    val picked = scans.head.selectedPartitions.partitionCount
    assert(picked <= 3, s"expected ≤3 pruned partitions, scanned $picked")
  }

  test("stored index: no corpus-sized shuffle in the BM25 plan (tf side broadcast)") {
    import org.apache.spark.sql.execution.joins.SortMergeJoinExec
    for (df <- Seq(
        Search.bm25(toks, Seq("dup", "sort", "batch")),
        Search.bm25FromPostings(spark, indexPath, Seq("dup", "sort", "batch")))) {
      val smj = df.queryExecution.sparkPlan.collect {
        case j: SortMergeJoinExec => j }
      assert(smj.isEmpty,
        s"BM25 must broadcast the matching-docs side, never sort-merge " +
          s"the doc-length table:\n${df.queryExecution.sparkPlan}")
    }
  }

  test("BM25 touches only matching docs and is deterministic") {
    val a = Search.bm25(toks, Seq("dup", "sort"))
    val b = Search.bm25(toks, Seq("dup", "sort"))
    val ra = a.select(col("id").cast("long"), col("score")).as[(Long, Double)].collect().toMap
    val rb = b.select(col("id").cast("long"), col("score")).as[(Long, Double)].collect().toMap
    assert(ra == rb)
    val matching = toks.where(arrays_overlap(col("ws"),
      typedLit(Seq("dup", "sort")))).count()
    assert(ra.size == matching, "exactly the docs containing ≥1 query term are scored")
  }

  test("evalRanked: hand-computed MRR/nDCG; zero-hit query scores 0; truthless query excluded") {
    // query 1: relevant at ranks 2 and 4 (plus 3 relevant outside top-k)
    // query 2: nothing relevant retrieved; query 3: no truth at all
    val ranked = (1 to 5).flatMap(r => Seq((1L, 100L + r, r), (2L, 200L + r, r),
      (3L, 300L + r, r))).toDF("query_id", "corpus_id", "rn")
    val rel = (Seq((1L, 102L), (1L, 104L)) ++ (1 to 3).map(i => (1L, 900L + i)) ++
      Seq((2L, 999L))).toDF("query_id", "corpus_id")
    val out = Search.evalRanked(ranked, rel, k = 5)
      .orderBy("query_id")
      .select("query_id", "n_rel_at_k", "first_rel_rank", "mrr4", "dcg4",
        "idcg4", "ndcg")
      .as[(Long, Long, Int, Long, Long, Long, Double)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L), "truthless query must be excluded")
    // dcg4 = round(1e4/log2 3) + round(1e4/log2 5) = 6309 + 4307
    // idcg4 = 10000 + 6309 + 5000 + 4307 + 3869 (5 relevant, k = 5)
    assert(out(0) === ((1L, 2L, 2, 5000L, 10616L, 29485L, 0.36)))
    assert(out(1) === ((2L, 0L, 0, 0L, 0L, 10000L, 0.0)))
  }

  test("queryLikelihood: hand-replayed Dirichlet parts; zero-match docs keep the length prior") {
    // corpus: d1 "x x y" (len 3), d2 "y z" (2), d3 "w w" (2); q = [x, y], μ = 10
    // C = 7, cf(x) = 2, cf(y) = 2
    val docs = Seq((1L, "x x y"), (2L, "y z"), (3L, "w w"))
      .toDF("doc_id", "text")
    val t = graft.operators.TextStats.tokenized(docs, "doc_id", "text")
    val out = graft.operators.Search.queryLikelihood(t, Seq("x", "y"), mu = 10.0)
      .as[(Long, Double)].collect().toMap
    def p4(x: Double): Long =
      java.math.BigDecimal.valueOf(1e4 * x)
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    def m(tf: Long, cf: Long) = p4(math.log(1.0 + tf.toDouble * 7 / (10.0 * cf)))
    // (1e4 · |q|) · ln — the engine's multiply order
    def prior(len: Long): Long =
      java.math.BigDecimal.valueOf(1e4 * 2.0 * math.log(10.0 / (len + 10.0)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    assert(out(1L) === (m(2, 2) + m(1, 2) + prior(3)) / 1e4)
    assert(out(2L) === (m(1, 2) + prior(2)) / 1e4)
    assert(out(3L) === prior(2) / 1e4) // no match → length prior only
    assert(out(1L) > out(2L) && out(2L) > out(3L))
  }
}
