package graft

import graft.operators.{Dedup, Similarity}
import org.apache.spark.sql.functions._

class DedupSimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog"),
    (2L, "the quick brown fox jumps over the lazy cat"),   // near-dup of 1
    (3L, "completely different words entirely here now"),
    (4L, "the quick brown fox jumps over the lazy dog"),   // exact dup of 1
    (5L, "")).toDF("doc_id", "text")

  test("exact dedup groups identical normalized content") {
    val out = Dedup.exact(docs, "doc_id", "text")
    assert(out.count() === 4)  // 1&4 merge
    val merged = out.where(col("n_copies") === 2).head()
    assert(merged.getAs[Long]("keep_id") === 1L)
  }

  test("jaccard pairs finds near-dups above threshold, via inverted index") {
    val pairs = Dedup.jaccardPairs(docs, "doc_id", "text", n = 3, minJaccard = 0.5)
      .orderBy("id_a", "id_b")
      .select("id_a", "id_b").as[(Long, Long)].collect().toSeq
    assert(pairs.contains((1L, 4L)))  // exact dup → jaccard 1.0
    assert(pairs.contains((1L, 2L)))  // near dup (6/8 shared trigrams)
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("maxDocFreq caps candidate generation but keeps exact scores") {
    // every doc shares the stop-shingle "a a a"; docs 1/2 also share rare
    // content. With the cap, the stop-shingle contributes no candidates
    // (linear join), yet the emitted pair's jaccard uses the FULL sets.
    val stopDocs = Seq(
      (1L, "a a a unique text one two three four"),
      (2L, "a a a unique text one two three five"),
      (3L, "a a a something else entirely different here"),
      (4L, "a a a other words with nothing shared across")
    ).toDF("doc_id", "text")
    val capped = Dedup.jaccardPairs(stopDocs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = Some(2))
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    val exact = Dedup.jaccardPairs(stopDocs, "doc_id", "text",
        n = 3, minJaccard = 0.5, maxDocFreq = None)
      .select("id_a", "id_b", "jaccard").as[(Long, Long, Double)].collect().toSeq
    // the surviving pair scores identically in both modes (full-set verify)
    assert(capped.toSet.subsetOf(exact.toSet))
    assert(capped.exists { case (a, b, _) => (a, b) == (1L, 2L) })
    val cappedJ = capped.find { case (a, b, _) => (a, b) == (1L, 2L) }.get._3
    val exactJ = exact.find { case (a, b, _) => (a, b) == (1L, 2L) }.get._3
    assert(cappedJ === exactJ)
  }

  test("containment finds the asymmetric excerpt-in-host pair Jaccard misses") {
    // host: 10 words -> 8 trigrams; excerpt: its first 5 words -> 3
    // trigrams, ALL present in the host. C(excerpt→host) = 1.0 while
    // J = 3/8 — below any near-dup threshold.
    val cdocs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon"),
      (3L, "totally unrelated content lives in this row")).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(cdocs, "doc_id", "text", 3)
    val out = Dedup.containmentPairsFromSets(sets, minContainment = 0.9)
      .select("id_sub", "id_sup", "containment")
      .as[(Long, Long, Double)].collect().toSeq
    assert(out === Seq((2L, 1L, 1.0)))  // only the excerpt direction
    // and the symmetric Jaccard family indeed misses it at 0.8
    val j = Dedup.jaccardPairsFromSets(sets, 0.8).count()
    assert(j === 0L)
  }

  test("containment df-cap path emits the same exact scores as the uncapped path") {
    val stopDocs = Seq(
      (1L, "a a a unique text one two three four"),
      (2L, "a a a unique text one two three"),
      (3L, "a a a something else entirely different here"),
      (4L, "a a a other words with nothing shared across")
    ).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(stopDocs, "doc_id", "text", 3)
    def rows(cap: Option[Int]) =
      Dedup.containmentPairsFromSets(sets, 0.8, cap)
        .select("id_sub", "id_sup", "containment")
        .as[(Long, Long, Double)].collect().toSet
    val capped = rows(Some(2))
    val exact = rows(None)
    assert(capped.subsetOf(exact))
    // doc 2's shingles are a prefix-subset of doc 1's: containment 2->1
    // must survive the cap with its exact 1.0 score
    assert(capped.contains((2L, 1L, 1.0)))
  }

  test("sharedSpans merges anchor runs into maximal spans with both positions") {
    // shared verbatim run "a b c d e f g h" (8 tokens): at pos 2 in doc 1,
    // pos 1 in doc 2. w=5 -> 4 consecutive anchors on one diagonal.
    val spanDocs = Seq(
      (1L, "x1 x2 a b c d e f g h x3"),
      (2L, "y1 a b c d e f g h y2 y3"),
      (3L, "p q r s t u v m n o")).toDF("doc_id", "text")
    val toks = graft.operators.TextStats.tokenized(spanDocs, "doc_id", "text")
    val out = Dedup.sharedSpans(toks, w = 5, minLen = 8)
      .select("id_a", "id_b", "start_a", "start_b", "len_tokens")
      .as[(Long, Long, Int, Int, Long)].collect().toSeq
    assert(out === Seq((1L, 2L, 2, 1, 8L)))
    // a 7-token shared run (3 anchors) falls below minLen=8
    val shorter = Seq(
      (1L, "x1 x2 a b c d e f g x3"),
      (2L, "y1 a b c d e f g y2 y3")).toDF("doc_id", "text")
    val none = Dedup.sharedSpans(
      graft.operators.TextStats.tokenized(shorter, "doc_id", "text"),
      w = 5, minLen = 8).count()
    assert(none === 0L)
  }

  test("stripSharedSpans removes the later doc's shared run, keeps novel tokens") {
    val spanDocs = Seq(
      (1L, "x1 x2 a b c d e f g h x3"),
      (2L, "y1 a b c d e f g h y2 y3"),
      (3L, "p q r s t u v m n o")).toDF("doc_id", "text")
    val toks = graft.operators.TextStats.tokenized(spanDocs, "doc_id", "text")
    val out = Dedup.stripSharedSpans(toks, w = 5, minLen = 8)
      .select("id", "n_tokens", "n_kept_tokens", "cleaned_text")
      .as[(Long, Long, Long, String)].collect().sortBy(_._1).toSeq
    assert(out === Seq(
      (1L, 11L, 11L, "x1 x2 a b c d e f g h x3"),   // first occurrence survives
      (2L, 11L, 3L, "y1 y2 y3"),                    // shared run stripped
      (3L, 10L, 10L, "p q r s t u v m n o")))
  }

  test("chunkProvenance names both contributors of a merged document") {
    def page(tag: String) = (1 to 12).map(i =>
      s"$tag sentence number $i carries distinctive wording about $tag topics")
      .mkString(" ")
    val baseline = Seq((1L, page("alpha")), (2L, page("beta")),
      (3L, page("gamma"))).toDF("doc_id", "text")
    // the probe doc is a MERGE of docs 1 and 2; doc 3 contributes nothing
    val probe = Seq((100L, page("alpha") + " " + page("beta")))
      .toDF("doc_id", "text")
    val out = Dedup.chunkProvenance(baseline, probe, "doc_id", "text")
      .select("probe_id", "base_id", "share_frac")
      .as[(Long, Long, Double)].collect().toSeq
    val byBase = out.map(r => r._2 -> r._3).toMap
    assert(byBase.keySet === Set(1L, 2L), s"contributors: $out")
    // the junction chunk and the final-boundary convention land with
    // the first half, so the second contributes less than 50%
    assert(byBase(1L) > 0.2 && byBase(2L) > 0.2,
      s"both halves must contribute strongly: $out")
  }

  test("mutualMarginPairs mines only mutual top-1 pairs, with both margins") {
    // a1↔b1 are each other's top-1 (mutual). a2's top-1 is also b1 (not
    // mutual); b2's top-1 is a2 (not mutual). Expect exactly (a1, b1).
    val a = Seq((1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)))
      .toDF("vec_id", "embedding")
    val b = Seq((10L, Array(1f, 0.05f)), (20L, Array(0f, 1f)))
      .toDF("vec_id", "embedding")
    val out = Similarity.mutualMarginPairs(a, b, "vec_id", "embedding")
      .select("id_a", "id_b", "cosine", "margin_a", "margin_b")
      .as[(Long, Long, Double, Double, Double)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === Seq((1L, 10L)))
    val r = out.head
    assert(r._3 > 0.99)                      // near-parallel match
    assert(r._4 > 0 && r._5 > 0)             // both margins positive
    // singleton populations: margin falls back to cos1 - (-1)
    val solo = Similarity.mutualMarginPairs(
        a.limit(1), b.limit(1), "vec_id", "embedding")
      .select("margin_a").as[Double].head()
    assert(solo > 1.9)
  }

  test("mutualMarginPairsIvf at full probe equals the brute-force miner") {
    val emb = graft.Tables.embeddings(spark, "/root/testdata/sf0.001")
    val a = emb.where(col("label") === 0)
    val b = emb.where(col("label") === 1)
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.select("id_a", "id_b", "cosine", "margin_a", "margin_b")
        .as[(Long, Long, Double, Double, Double)].collect().toSet
    val nlist = 4
    val brute = rows(Similarity.mutualMarginPairs(a, b, "vec_id", "embedding"))
    val full = rows(Similarity.mutualMarginPairsIvf(a, b, "vec_id",
      "embedding", nlist = nlist, nprobe = nlist))
    assert(full === brute, "full probe must be bit-equal to brute force")
    // a narrow probe both misses true pairs AND mints probe-local ones
    // (each side's "best" is only best among PROBED candidates) — the
    // documented ANN tradeoff; verify it still produces mutual verdicts
    // and that every pair brute+narrow agree on scores identically
    val narrow = rows(Similarity.mutualMarginPairsIvf(a, b, "vec_id",
      "embedding", nlist = nlist, nprobe = 1))
    assert(narrow.nonEmpty)
    val bruteCos = brute.map(r => (r._1, r._2) -> r._3).toMap
    narrow.foreach { r =>
      bruteCos.get((r._1, r._2)).foreach(c => assert(c === r._3,
        "a pair present in both miners must carry the same top-1 cosine"))
    }
  }

  test("minhash LSH candidates verify to the same pairs as exact jaccard") {
    val exact = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    val lsh = Dedup.minhashDedup(docs, "doc_id", "text", 3, 9, 3, 0.7)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(lsh.subsetOf(exact))       // LSH never invents pairs
    assert(lsh.contains((1L, 4L)))    // identical docs always collide
  }

  test("dupClusters: min-label spans chains, singletons keep themselves") {
    import graft.operators.Dedup
    // chain 1-2, 2-3, 3-4 (diameter 3 forces multiple rounds); 5-6 pair; 7 alone
    val ids = (1L to 7L).map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (5L, 6L)).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(ids, "doc_id", pairs)
      .orderBy("doc_id").as[(Long, Long)].collect().toSeq
    assert(out === Seq(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }

  test("dupClusters: 1000-link chain converges within 12 rewiring rounds") {
    import graft.operators.Dedup
    // The pathological shape for label propagation: a single path of
    // 1001 vertices (diameter 1000). Pointer-jump hash-min needed 27+
    // plateau-bound rounds on a far SHORTER chain at sf0.1 (q192);
    // large-star/small-star must flatten this in O(log n) — the
    // maxIters=12 cap IS the gate (dupClusters fails loud past it).
    // Edges deliberately reversed + shuffled so convergence can't rely
    // on a lucky orientation.
    val ids = (0L to 1000L).map(Tuple1(_)).toDF("doc_id")
    val chain = (0L until 1000L).map(i =>
      if (i % 2 == 0) (i + 1, i) else (i, i + 1))
    val pairs = scala.util.Random.shuffle(chain).toDF("id_a", "id_b")
    val out = Dedup.dupClusters(ids, "doc_id", pairs, maxIters = 12)
    assert(out.where(col("cluster_rep") =!= 0L).isEmpty)
    assert(out.count() === 1001L)
  }

  test("dupClusters: string keys cluster to the lexicographic min") {
    import graft.operators.Dedup
    val ids = Seq("ann", "bob", "cid", "dee", "eve").map(Tuple1(_)).toDF("doc_id")
    val pairs = Seq(("dee", "cid"), ("bob", "cid"), ("eve", "dee"))
      .toDF("id_a", "id_b")
    val out = Dedup.dupClusters(ids, "doc_id", pairs)
      .orderBy("doc_id").as[(String, String)].collect().toSeq
    assert(out === Seq("ann" -> "ann", "bob" -> "bob", "cid" -> "bob",
      "dee" -> "bob", "eve" -> "bob"))
  }

  test("contaminationFlags: docs sharing a benchmark n-gram get flagged, others not") {
    import graft.operators.Dedup
    val bench = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "some training text with the secret benchmark answer inside it"),
      (2L, "completely unrelated content about other things entirely"),
      (3L, "")).toDF("doc_id", "text")
    val out = Dedup.contaminationFlags(corpus, "doc_id", "text", bench, "bid", "btext")
      .orderBy("doc_id")
      .select("doc_id", "contaminated").as[(Long, Boolean)].collect().toSeq
    assert(out === Seq(1L -> true, 2L -> false, 3L -> false))
  }

  test("simhash: identical docs equal; near-dups closer than unrelated") {
    def hamming(a: String, b: String): Int = a.zip(b).count(p => p._1 != p._2)
    val sigs = Dedup.simhash(docs.where(col("doc_id") < 5), "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[String]("simhash64")).toMap
    assert(sigs(1L).length === 64)
    assert(sigs(1L) === sigs(4L))
    assert(hamming(sigs(1L), sigs(2L)) < hamming(sigs(1L), sigs(3L)))
  }

  test("native hamming_dist: codegen result, zero distance, length mismatch") {
    graft.plans.HammingDist.register(spark)
    val df = Seq(("0101", "0101"), ("0101", "1101"), ("0000", "1111"))
      .toDF("a", "b")
      .select(call_function("hamming_dist", col("a"), col("b")).as("d"))
    assert(df.as[Int].collect().toSeq === Seq(0, 1, 4))
    val e = intercept[Exception] {
      Seq(("01", "010")).toDF("a", "b")
        .select(call_function("hamming_dist", col("a"), col("b"))).collect()
    }
    assert(e.getMessage.contains("length mismatch") ||
      e.getCause.getMessage.contains("length mismatch"))
  }

  test("simhashNearDups pairs exact dups at hamming 0, not unrelated docs") {
    val pairs = Dedup.simhashNearDups(docs.where(col("doc_id") =!= 5L),
        "doc_id", "text", maxHamming = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    assert(pairs((1L, 4L)) === 0)                      // exact dup
    assert(!pairs.keySet.exists(p => p._1 == 3L || p._2 == 3L))  // unrelated
  }

  private lazy val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),
    (2L, Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(-1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")

  test("MMR re-rank: pure relevance keeps the duplicate, diversity swaps it out") {
    val corpus = Seq(
      (1L, Array(1.0f, 0.9f, 0.0f)),   // a — most relevant
      (2L, Array(1.0f, 0.9f, 0.0f)),   // exact duplicate of a
      (3L, Array(1.0f, 1.0f, 1.0f))    // diverse, lower relevance
    ).toDF("vec_id", "embedding")
    val query = Seq((100L, Array(1.0f, 1.0f, 0.0f))).toDF("vec_id", "embedding")
    def picks(lambda: Double) =
      Similarity.mmrTopK(corpus, query, "vec_id", "embedding",
          k = 2, m = 3, dim = 3, lambda = lambda)
        .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(picks(1.0) === Seq(1L, 2L))   // relevance only → dup survives
    assert(picks(0.5) === Seq(1L, 3L))   // diversity penalty evicts the dup
  }

  test("MMR re-rank accepts int ids and double vectors (IVF-family frames)") {
    val corpus = Seq(
      (1, Array(1.0, 0.9, 0.0)),
      (2, Array(1.0, 0.9, 0.0)),
      (3, Array(1.0, 1.0, 1.0))).toDF("vec_id", "embedding")
    val query = Seq((100, Array(1.0, 1.0, 0.0))).toDF("vec_id", "embedding")
    val out = Similarity.mmrTopK(corpus, query, "vec_id", "embedding",
        k = 2, m = 3, dim = 3, lambda = 0.5)
      .orderBy("rank").select("corpus_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 3L))
  }

  test("brute-force cosine top-k ranks by similarity") {
    val out = Similarity.bruteForceTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 3, dim = 3)
      .orderBy("rn").select("corpus_id").as[Long].collect().toSeq
    assert(out === Seq(1L, 2L, 3L))  // 0.994 > 0.0 > -1.0
  }

  test("sign-LSH top-k only searches the query's bucket") {
    val out = Similarity.signLshTopK(vecs, vecs.where(col("vec_id") === 0),
        "vec_id", "embedding", k = 3, dim = 3, bits = 3)
      .select("corpus_id").as[Long].collect().toSeq
    // vec 3 has a different sign bucket (negative dim 1) → pruned;
    // vecs 1,2 share the all-non-negative bucket
    assert(out.toSet === Set(1L, 2L))
  }

  test("snapshotDiff: added/removed/changed/unchanged; whitespace drift is not a change") {
    val v1 = Seq((1L, "same text"), (2L, "will change"), (3L, "will vanish"),
      (4L, "Spaced   Text")).toDF("doc_id", "text")
    val v2 = Seq((1L, "same text"), (2L, "has changed"), (5L, "brand new"),
      (4L, "spaced text")).toDF("doc_id", "text")
    val out = Dedup.snapshotDiff(v1, v2, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(out === Map(1L -> "unchanged", 2L -> "changed", 3L -> "removed",
      5L -> "added", 4L -> "unchanged"))  // 4: normalization absorbs the drift
  }

  test("incrementalRecompute: only churn is recomputed, result equals a full recompute") {
    val v1 = Seq((1L, "steady text one"), (2L, "old words here"),
      (3L, "doomed document")).toDF("doc_id", "text")
    val v2 = Seq((1L, "steady text one"), (2L, "new words here"),
      (4L, "arrived document")).toDF("doc_id", "text")
    def score(df: org.apache.spark.sql.DataFrame) =
      df.select(col("doc_id"), length(col("text")).as("len"))
    var computeSaw = -1L
    val out = Dedup.incrementalRecompute(v1, score(v1), v2, "doc_id", "text") {
        df => computeSaw = df.count(); score(df) }
      .orderBy("doc_id")
      .as[(Long, Int, Boolean)].collect().toSeq
    assert(computeSaw === 2L, "compute must see exactly the added+changed docs")
    assert(out === Seq((1L, 15, false), (2L, 14, true), (4L, 16, true)))
    // law: identical to scoring all of v2 directly
    val full = score(v2).orderBy("doc_id").as[(Long, Int)].collect().toSeq
    assert(out.map(r => (r._1, r._2)) === full)
  }

  test("editDistancePairs: bands find sub/ins/del pairs, verify rejects transpositions") {
    // sub (alpja), append (alphax), delete (alph), transposition (aplha, d=2
    // but shares deletion variant "apha" with alpha → candidate the verify
    // must reject), unrelated (omega), exact dup (collapsed by distinct)
    val names = Seq("alpha", "alpja", "alphax", "alph", "aplha", "omega", "alpha")
      .toDF("name")
    val out = Dedup.editDistancePairs(names, "name", minLen = 4)
      .select("word_a", "word_b").as[(String, String)].collect().toSet
    assert(out === Set(
      ("alph", "alpha"), ("alpha", "alphax"), ("alpha", "alpja")))
  }

  test("sortedNeighborPairs: window-bounded recall — adjacent edits caught, first-char edits missed") {
    // sorted vocabulary: aaaa, aaab, ab00, ab01, ab02, ab03, baaa
    // (aaaa, baaa) is a true d=1 pair but sits at rank gap 6 ≥ window —
    // the documented SNM miss; every other d=1 pair has gap ≤ 3
    val names = Seq("aaaa", "aaab", "ab00", "ab01", "ab02", "ab03", "baaa",
      "aaaa").toDF("name")
    val out = Dedup.sortedNeighborPairs(names, "name", window = 6,
      maxDist = 1, minLen = 4)
      .select("word_a", "word_b").as[(String, String)].collect().toSet
    assert(out === Set(
      ("aaaa", "aaab"), ("ab00", "ab01"), ("ab00", "ab02"),
      ("ab00", "ab03"), ("ab01", "ab02"), ("ab01", "ab03"),
      ("ab02", "ab03")))
    // the missed pair IS within one edit — SymSpell banding finds it
    val sym = Dedup.editDistancePairs(names, "name", minLen = 4)
      .select("word_a", "word_b").as[(String, String)].collect().toSet
    assert(sym.contains(("aaaa", "baaa")))
    // widening the window past the gap recovers it: SNM output equals
    // exactly {true pairs with rank gap < window}
    val wide = Dedup.sortedNeighborPairs(names, "name", window = 8,
      maxDist = 1, minLen = 4)
      .select("word_a", "word_b").as[(String, String)].collect().toSet
    // (aaab, baaa) also enters the widened window but is d=2 — the
    // verify rejects it
    assert(wide === out + (("aaaa", "baaa")))
  }

  test("pairProvenanceMatrix: unordered group cells, diagonal kept, shares sum to 1e6") {
    val docs = Seq((1L, "web"), (2L, "web"), (3L, "wiki"), (4L, "news"))
      .toDF("doc_id", "source")
    // (1,2) within web; (2,3) and (3,1) both web↔wiki regardless of
    // direction; (3,4) wiki↔news normalizes to (news, wiki)
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 1L), (3L, 4L))
      .toDF("id_a", "id_b")
    val out = Dedup.pairProvenanceMatrix(pairs, docs, "doc_id", "source")
      .orderBy("source_a", "source_b")
      .as[(String, String, Long, Long)].collect()
    assert(out.toSeq === Seq(
      ("news", "wiki", 1L, 250000L),
      ("web", "web", 1L, 250000L),
      ("web", "wiki", 2L, 500000L)))
  }

  test("JaroWinkler: parity with DuckDB jaro_winkler_similarity on probe pairs; codegen path agrees") {
    import graft.plans.JaroWinkler
    import org.apache.spark.unsafe.types.UTF8String
    def jw(a: String, b: String): Double =
      JaroWinkler.compute(UTF8String.fromString(a), UTF8String.fromString(b))
    // expected values read off DuckDB 1.x jaro_winkler_similarity —
    // the q261 oracle's scorer — covering: transpositions (MARTHA),
    // prefix boost (DIXON), no boost below the 0.7 core (ab/axyzxyz:
    // core .5476 with prefix 1 stays unboosted), prefix cap 4
    // (abcde/…: 5-char prefix boosts as 4), zero-match, and the
    // empty-string-is-0 convention.
    val expect = Seq(
      ("MARTHA", "MARHTA") -> 0.9611111111111111,
      ("DIXON", "DICKSONX") -> 0.8133333333333332,
      ("JELLYFISH", "SMELLYFISH") -> 0.8962962962962964,
      ("CRATE", "TRACE") -> 0.7333333333333334,
      ("DwAyNE", "DuANE") -> 0.8400000000000001,
      ("arnab", "aranb") -> 0.9466666666666665,
      ("ab", "axyzxyz") -> 0.5476190476190476,
      ("abcd", "abzzzzzzzz") -> 0.5666666666666667,
      ("abcde", "abcdezzzzzzzzzzzzzzzzzzz") -> 0.8416666666666667,
      ("abc", "abc") -> 1.0,
      ("a", "b") -> 0.0,
      ("", "abc") -> 0.0,
      ("", "") -> 0.0)
    for (((a, b), e) <- expect)
      assert(math.abs(jw(a, b) - e) < 1e-12, s"($a, $b): ${jw(a, b)} != $e")
    // symmetric by definition
    for (((a, b), _) <- expect) assert(jw(a, b) === jw(b, a))
    // the registered expression (whole-stage codegen path) agrees with
    // the interpreted kernel on every pair
    graft.plans.JaroWinkler.register(spark)
    val df = expect.map(_._1).toDF("a", "b")
      .withColumn("jw", call_function(JaroWinkler.fnName, col("a"), col("b")))
    val got = df.select("a", "b", "jw").as[(String, String, Double)]
      .collect().map { case (a, b, v) => (a, b) -> v }.toMap
    for (((a, b), e) <- expect) assert(got((a, b)) === jw(a, b), s"codegen ($a, $b)")
  }

  test("fellegiSunter: hand-computed m, u, and m/u on a 4-record fixture") {
    // field values by id: 1→x, 2→x, 3→y, 4→z
    val recs = Seq((1L, "x"), (2L, "x"), (3L, "y"), (4L, "z"))
      .toDF("id", "f")
    // proxy matches: (1,2) agrees on f, (1,3) does not
    val pairs = Seq((1L, 2L), (1L, 3L)).toDF("id_a", "id_b")
    val out = Dedup.fellegiSunter(recs, "id", pairs,
      Seq("f" -> col("f"))).collect()
    assert(out.length === 1)
    val r = out.head
    assert(r.getAs[String]("field") === "f")
    assert(r.getAs[Long]("n_pairs") === 2L)
    assert(r.getAs[Long]("n_agree") === 1L)
    // m = 1/2 → 5000 on the 1e-4 grid
    assert(r.getAs[Long]("m4") === 5000L)
    // u = Σ n_v(n_v−1) / N(N−1) = (2·1) / (4·3) = 1/6 → 16666667 @1e8
    assert(r.getAs[Long]("u8") === 16666667L)
    // m/u = (1/2)/(1/6) = 3 → 30000 on the 1e-4 grid
    assert(r.getAs[Long]("mu_ratio4") === 30000L)
  }

  test("prefix-filtered Jaccard join: output equals the full inverted-index join, fewer candidates") {
    val sets = Dedup.shingleSetsFromTokens(
      graft.operators.TextStats.tokenized(
        Tables.documents(spark, "/root/testdata/sf0.001"), "doc_id", "text"), 3)
      .persist()
    try {
      for (t <- Seq(0.6, 0.8)) {
        val full = Dedup.jaccardPairsFromSets(sets, t, maxDocFreq = None)
          .as[(Long, Long, Double)].collect().toSet
        val pref = Dedup.jaccardPairsPrefixFromSets(sets, t)
          .as[(Long, Long, Double)].collect().toSet
        assert(pref === full, s"prefix join diverged at t=$t")
        assert(full.nonEmpty, "fixture should contain near-dups")
      }
      // the point of the filter: candidate pairs shrink vs the full
      // index's shared-token pairs
      val fullCand = sets.select(col("id"), explode(col("shset")).as("s"))
      val fullPairs = fullCand.select(col("id").as("id_a"), col("s"))
        .join(fullCand.select(col("id").as("id_b"), col("s")), "s")
        .where(col("id_a") < col("id_b"))
        .select("id_a", "id_b").distinct().count()
      val prefPairs = Dedup.prefixCandidates(sets, 0.8).count()
      assert(prefPairs < fullPairs / 2,
        s"prefix filter barely pruned: $prefPairs vs $fullPairs")
    } finally { sets.unpersist(); () }
  }

  test("winnowingPairs: a shared 6-token run is GUARANTEED to pair (MOSS law)") {
    // n=3, w=4 ⇒ any shared run of ≥ n + w − 1 = 6 tokens shares a
    // selected fingerprint. Docs a/b share exactly one 6-token verbatim
    // block inside otherwise disjoint text (Jaccard over their trigram
    // sets is tiny); doc c is unrelated.
    val run = "zeta eta theta iota kappa lambda"
    val docsW = Seq(
      (1L, s"alpha beta gamma delta $run epsilon phi chi psi omega"),
      (2L, s"one two three four five $run six seven eight nine ten"),
      (3L, "red orange yellow green blue indigo violet maroon teal"))
      .toDF("id", "text")
    val toks = graft.operators.TextStats.tokenized(docsW, "id", "text")
    val fps = graft.operators.TextStats.winnowedFps(toks, n = 3, w = 4)
    val pairs = Dedup.winnowingPairs(fps, minShared = 1L, maxDocFreq = 10)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs === Set((1L, 2L)))
    // sanity: overlap fraction rides the grid and denominators are the
    // UNCAPPED per-doc selection sizes
    val row = Dedup.winnowingPairs(fps, minShared = 1L, maxDocFreq = 10)
      .head()
    val ovl = row.getAs[Long]("ovl4")
    assert(ovl > 0L && ovl <= 10000L)
    // df-cap: with every fingerprint capped out, no candidates survive
    assert(Dedup.winnowingPairs(fps, minShared = 1L, maxDocFreq = 0).count() === 0L)
  }
}
