package graft

import graft.operators.{Dedup, Embeddings, TextStats}
import org.apache.spark.sql.functions._

/** Round-3 operators: repetition stats, winnowing fingerprints, corpus
  * n-grams, exact-substring decontamination, int8 quantization. */
class TextStatsSpec extends SparkSpec {
  import spark.implicits._

  test("repetitionStats: boilerplate scores high top-bigram fraction") {
    val docs = Seq(
      (1L, "buy now buy now buy now buy now"),         // one bigram dominates
      (2L, "each word here appears exactly once okay"),
      (3L, "")).toDF("doc_id", "text")
    val out = TextStats.repetitionStats(docs, "doc_id", "text")
      .collect().map(r => r.getAs[Long]("id") ->
        (r.getAs[Long]("n_tokens"), r.getAs[Double]("frac_distinct"),
          r.getAs[Double]("top_bigram_frac"))).toMap
    assert(!out.contains(3L))                        // empty doc dropped
    assert(out(1L)._1 === 8L)
    assert(out(1L)._2 === 0.25)                      // 2 distinct / 8
    // "now buy" appears 3 of 7 bigrams; "buy now" 4 of 7
    assert(out(1L)._3 === round4(4.0 / 7))
    assert(out(2L)._2 === 1.0)
    assert(out(2L)._3 === round4(1.0 / 6))
  }

  private def round4(x: Double): Double = math.rint(x * 1e4) / 1e4

  test("winnowing guarantee: docs sharing a run of >= n+w-1 tokens share a fingerprint") {
    val shared = "alpha bravo charlie delta echo foxtrot"  // 6 tokens = n+w-1
    val docs = Seq(
      (1L, s"unrelated prefix words here $shared and trailing junk"),
      (2L, s"totally other opening tokens $shared plus different tail"),
      (3L, "nothing in common with either document at all")).toDF("doc_id", "text")
    val fps = TextStats.winnowingFingerprints(docs, "doc_id", "text", n = 3, w = 4)
    // recompute the selected fingerprint SETS per doc for the overlap check
    val hashed = TextStats.posShingles(docs, "doc_id", "text", 3)
      .withColumn("h", conv(substring(md5(col("s")), 1, 12), 16, 10).cast("long"))
      .collect().groupBy(_.getAs[Long]("id"))
      .map { case (id, rows) =>
        val hs = rows.sortBy(_.getAs[Int]("pos")).map(_.getAs[Long]("h")).toVector
        id -> hs.sliding(4).filter(_.size == 4).map(_.min).toSet
      }
    assert((hashed(1L) intersect hashed(2L)).nonEmpty)
    assert((hashed(1L) intersect hashed(3L)).isEmpty)
    // operator output agrees with the recomputation
    val out = fps.collect().map(r => r.getAs[Long]("id") -> r.getAs[Long]("n_fp")).toMap
    assert(out(1L) === hashed(1L).size && out(2L) === hashed(2L).size)
  }

  test("topNgrams counts positional occurrences, deterministic order") {
    val docs = Seq(
      (1L, "a b c a b c a b c"),   // "a b c" x3 (positions), "b c a" x2, "c a b" x2
      (2L, "a b c only once")).toDF("doc_id", "text")
    val out = TextStats.topNgrams(docs, "doc_id", "text", n = 3, k = 2)
      .as[(String, Long)].collect().toSeq
    assert(out.head === ("a b c", 4L))               // 3 in doc1 + 1 in doc2
    assert(out(1)._2 === 2L)
  }

  test("substringContamination flags verbatim probe hits only; null text is clean") {
    val probes = Seq("secret eval passage", "another probe").toDF("probe")
    val docs = Seq(
      (1L, "contains the secret eval passage inside"),
      (2L, "secret eval but not the full phrase"),
      (3L, "another probe appears here"),
      (4L, null)).toDF("doc_id", "text")
    val out = Dedup.substringContamination(docs, "doc_id", "text", probes, "probe")
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    // 4: SQL EXISTS semantics — null text is FALSE (not NULL), so a
    // downstream `!contaminated` keep-filter retains the doc
    assert(out === Map(1L -> true, 2L -> false, 3L -> true, 4L -> false))
  }

  test("bloom-prefiltered contamination flags equal the exact path") {
    val bench = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "some training text with the secret benchmark answer inside it"),
      (2L, "completely unrelated content about other things entirely"),
      (3L, "")).toDF("doc_id", "text")
    def rows(df: org.apache.spark.sql.DataFrame) =
      df.orderBy("doc_id").collect().map(r =>
        (r.getLong(0), r.getLong(1), r.getBoolean(2))).toSeq
    val exact = rows(Dedup.contaminationFlags(corpus, "doc_id", "text", bench, "bid", "btext"))
    val bloom = rows(Dedup.contaminationFlagsBloom(corpus, "doc_id", "text", bench, "bid", "btext"))
    assert(bloom === exact)
  }

  test("managed bloom flags: release() drops the cache, frame stays correct") {
    val bench = Seq((100L, "the secret benchmark answer is forty two"))
      .toDF("bid", "btext")
    val corpus = Seq(
      (1L, "some training text with the secret benchmark answer inside it"),
      (2L, "completely unrelated content about other things entirely")).toDF("doc_id", "text")
    val (flags, release) = Dedup.contaminationFlagsBloomManaged(
      corpus, "doc_id", "text", bench, "bid", "btext")
    def read() = flags.orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> r.getBoolean(2)).toSeq
    assert(read() === Seq(1L -> true, 2L -> false))
    release()
    // re-materialization after release recomputes and stays correct
    assert(read() === Seq(1L -> true, 2L -> false))
  }

  test("quantizeInt8: extreme element maps to ±127, zero vector to all zeros") {
    val vecs = Seq(
      (1L, Array(0.5f, -1.0f, 0.25f)),
      (2L, Array(0.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val out = Embeddings.quantizeInt8(vecs, "vec_id", "embedding")
      .collect().map(r => r.getAs[Long]("vec_id") ->
        (r.getAs[Double]("max_abs"), r.getAs[Long]("q_sum"), r.getAs[Long]("q_l1"))).toMap
    // scale = 127; q = (64, -127, 32) → sum -31, l1 223
    assert(out(1L) === ((1.0, -31L, 223L)))
    assert(out(2L) === ((0.0, 0L, 0L)))
  }

  test("l2Normalize: unit norm afterwards; zero vector unchanged") {
    val vecs = Seq((1L, Array(3.0f, 4.0f)), (2L, Array(0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val out = vecs.select(col("vec_id"),
        Embeddings.l2Normalize(col("embedding")).as("nv"))
      .as[(Long, Seq[Double])].collect().toMap
    assert(math.abs(out(1L).map(x => x * x).sum - 1.0) < 1e-12)
    assert(out(2L) === Seq(0.0, 0.0))
  }

  test("charEntropyStats: hand-computed values; repeated char scores zero; empty excluded") {
    val docs = Seq((1L, "aaaa"), (2L, "abab"), (3L, "abcd"), (4L, ""))
      .toDF("doc_id", "text")
    val out = TextStats.charEntropyStats(docs, "doc_id", "text")
      .orderBy("id")
      .select("id", "n_chars", "n_distinct", "entropy4")
      .as[(Long, Long, Long, Long)].collect()
    assert(out.map(_._1).toSeq === Seq(1L, 2L, 3L), "empty doc must be excluded")
    assert(out(0) === ((1L, 4L, 1L, 0L)))                   // one class: ln(1) = 0
    // "abab": two classes of k=2,n=4 → part = round(1e4·0.5·ln 2) = 3466 each
    assert(out(1) === ((2L, 4L, 2L, 6932L)))
    // "abcd": four classes k=1 → part = round(1e4·0.25·ln 4) = 3466 each;
    // 4·3466 = 13864 ≠ round(1e4·ln 4) = 13863 — parts round FIRST,
    // which is exactly what makes the sum order-free across engines
    assert(out(2) === ((3L, 4L, 4L, 13864L)))
    assert(out(2)._4 === 4L * math.round(1e4 * 0.25 * math.log(4.0)))
  }

  test("WordNgrams native expression matches the HOF formula for all (n, stride)") {
    graft.plans.WordNgrams.register(spark)
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "x"),
      (3L, ""),
      (4L, "p q r s")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    for (n <- 1 to 4; stride <- Seq(1, 2, n)) {
      val native = toks.select(col("id"),
          call_function(graft.plans.WordNgrams.fnName,
            col("ws"), lit(n), lit(stride)).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      val hof = toks.select(col("id"),
          when(size(col("ws")) >= n,
            transform(
              sequence(lit(0), floor((size(col("ws")) - n) / stride).cast("int")),
              i => concat_ws(" ", slice(col("ws"), i * stride + 1, lit(n)))))
            .otherwise(slice(col("ws"), lit(1), lit(0))).as("g"))
        .collect().map(r => r.getLong(0) -> r.getSeq[String](1)).toMap
      assert(native === hof, s"n=$n stride=$stride")
    }
  }

  test("groupTrimmedMean: outliers trimmed, straddling cells counted exactly") {
    // a: 1..9 plus outlier 1000, trim 10% → k=1 → mean(2..9) = 5.5 → 6
    // b: [1,1,1,10] trim 10% → k=0 → plain mean 13/4 → 3
    val rows = ((1L to 9L) :+ 1000L).map(v => ("a", v / 1e4)) ++
      Seq(1L, 1L, 1L, 10L).map(v => ("b", v / 1e4))
    val out = TextStats.groupTrimmedMean(rows.toDF("g", "v"), "g", "v", 0.1)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap
    assert(out === Map("a" -> ((10L, 1L, 6L)), "b" -> ((4L, 0L, 3L))))
    // straddle: [1,1,1,10] at 25% trim → keep two 1s → mean 1
    val s = TextStats.groupTrimmedMean(
        Seq(1L, 1L, 1L, 10L).map(v => ("c", v / 1e4)).toDF("g", "v"),
        "g", "v", 0.25)
      .as[(String, Long, Long, Long)].collect().toSeq
    assert(s === Seq(("c", 4L, 1L, 1L)))
  }

  test("vocabRichness: hapax/doubleton counts and the bias-corrected Chao1") {
    // g1: "a a b c" → counts {a:2, b:1, c:1}: D=3, f1=2, f2=1
    //   chao1 = 3 + 2·1/(2·2) = 3.5 → 4 (HALF_UP)
    // g2: "x y" → D=2, f1=2, f2=0: chao1 = 2 + 2·1/2 = 3
    val docs = Seq((1L, "a a b c", "g1"), (2L, "x y", "g2"))
      .toDF("doc_id", "text", "src")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = TextStats.vocabRichness(toks,
        docs.select(col("doc_id").as("id"), col("src")), "src")
      .as[(String, Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5, r._6))).toMap
    assert(out === Map(
      "g1" -> ((4L, 3L, 2L, 1L, 4L)),
      "g2" -> ((2L, 2L, 2L, 0L, 3L))))
  }

  test("groupPsiFromCells: hand-replayed parts against the corpus mix") {
    // grp a cells {1:2, 2:1}, grp b {2:3} → corpus {1:2, 2:4}, B=2,
    // t_a=3, t_b=3, t_all=6
    val cells = Seq(("a", 1L, 2L), ("a", 2L, 1L), ("b", 2L, 3L))
      .toDF("grp", "s4", "n")
    val out = TextStats.groupPsiFromCells(cells)
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    def part8(nG: Long, tG: Long, nAll: Long): Long = {
      val p = (nG + 0.5) / (tG + 0.5 * 2); val q = (nAll + 0.5) / (6 + 0.5 * 2)
      java.math.BigDecimal.valueOf(1e8 * ((p - q) * math.log(p / q)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    }
    assert(out === Map(
      "a" -> ((3L, part8(2, 3, 2) + part8(1, 3, 4))),
      "b" -> ((3L, part8(0, 3, 2) + part8(3, 3, 4)))))
    assert(out("a")._2 > 0 && out("b")._2 > 0)
  }

  test("groupTokenKl: hand-replayed unigram KL parts per group") {
    // g1 tokens {a:2, b:1}, g2 {a:1, b:3} → corpus {a:3, b:4}, t=7
    val docs = Seq((1L, "a a b", "g1"), (2L, "b b b a", "g2"))
      .toDF("doc_id", "text", "src")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = TextStats.groupTokenKl(toks,
        docs.select(col("doc_id").as("id"), col("src")), "src")
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n_tokens"), r.getAs[Long]("n_distinct"),
          r.getAs[Long]("kl8")))).toMap
    def part8(nSw: Long, tG: Long, nW: Long, t: Long): Long =
      java.math.BigDecimal.valueOf(
          1e8 * (nSw.toDouble / tG) * math.log(nSw.toDouble * t / (nW.toDouble * tG)))
        .setScale(0, java.math.RoundingMode.HALF_UP).longValueExact()
    val g1 = part8(2, 3, 3, 7) + part8(1, 3, 4, 7)
    val g2 = part8(1, 4, 3, 7) + part8(3, 4, 4, 7)
    assert(out === Map("g1" -> ((3L, 2L, g1)), "g2" -> ((4L, 2L, g2))))
    assert(g1 > 0 && g2 > 0) // both groups genuinely diverge from the mix
  }

  test("zipfFit: exact-power-law census fits slope −1; minCount and maxRank filter; points match the hand grid") {
    // freq = 12/rank exactly (12, 6, 4, 3) → ln freq = ln 12 − ln rank:
    // slope −1 up to the 1e4 grid snap; "z" (freq 1) is dropped by
    // minCount = 2
    val words = Seq.fill(12)("a") ++ Seq.fill(6)("b") ++
      Seq.fill(4)("c") ++ Seq.fill(3)("d") ++ Seq("z")
    val docs = Seq((1L, words.mkString(" "), "g"))
      .toDF("doc_id", "text", "src")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val groups = docs.select(col("doc_id").as("id"), col("src"))
    val got = TextStats.zipfFit(toks, groups, "src", minCount = 2L,
        maxRank = 500L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    // the same points through the same OLS — pins the census/rank/
    // filter logic; OLS itself is q194-oracle-gated
    def snap(v: Double): Long = math.rint(1e4 * math.log(v)).toLong
    val pts = Seq((1, 12), (2, 6), (3, 4), (4, 3))
      .map { case (r, f) => ("g", snap(r), snap(f)) }
      .toDF("grp", "x", "y")
    val want = graft.operators.Profiling.groupLinFit(pts, "grp", "x", "y")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.head._2 === 4L, "z must fall below minCount")
    // slope6 within one grid snap of the exact −1e6 power law
    assert(math.abs(got.head._3 + 1000000L) < 200L)
    assert(got.head._5 >= 9999L, "r² ≈ 1 on an exact power law")
  }

  test("heapsFit: bucketed growth checkpoints hand-computed; first occurrences counted once") {
    // bucketWidth 4 → docs 0–3 are bucket 0 (7 tokens, new types
    // a,b,c), docs 4–7 bucket 1 (5 tokens, new types d,e; a/b repeat)
    val docs = Seq(
      (0L, "a b"), (1L, "a c"), (2L, "a a"), (3L, "b"),
      (4L, "d d"), (5L, "a"), (6L, "e"), (7L, "b"))
      .toDF("doc_id", "text").withColumn("src", lit("g"))
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val groups = docs.select(col("doc_id").as("id"), col("src"))
    val got = TextStats.heapsFit(toks, groups, "src", bucketWidth = 4L)
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    def snap(v: Double): Long = math.rint(1e4 * math.log(v)).toLong
    val pts = Seq((7, 3), (12, 5))
      .map { case (n, v) => ("g", snap(n), snap(v)) }
      .toDF("grp", "x", "y")
    val want = graft.operators.Profiling.groupLinFit(pts, "grp", "x", "y")
      .as[(String, Long, Long, Long, Long)].collect().toSeq
    assert(got === want)
    assert(got.head._2 === 2L && got.head._5 === 10000L,
      "two checkpoints fit exactly")
  }

  test("vocabCoverageCurve: exact shares at power-of-two ranks; ties break by token") {
    // census a:5 b:3 c:1 d:1 (total 10); ranks c=3, d=4 by token asc
    val docs = Seq((1L, "a a a a a b b b c d"))
      .toDF("doc_id", "text").withColumn("src", lit("g"))
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val groups = docs.select(col("doc_id").as("id"), col("src"))
    val got = TextStats.vocabCoverageCurve(toks, groups, "src", maxLog2 = 2)
      .orderBy(col("k"))
      .as[(String, Int, Long, Long, Long, Long)].collect().toSeq
    assert(got === Seq(
      ("g", 0, 1L, 5L, 10L, 5000L),
      ("g", 1, 2L, 8L, 10L, 8000L),
      ("g", 2, 4L, 10L, 10L, 10000L)))
  }

  test("jsDivergencePairs: identical distributions score zero; hand-computed divergence on a mirrored pair; symmetric in group order") {
    val docs = Seq(
      (1L, "a b", "g1"), (2L, "a b", "g2"), (3L, "a a", "g3"),
      (4L, "b b", "g4")).toDF("doc_id", "text", "src")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val groups = docs.select(col("doc_id").as("id"), col("src"))
    val got = TextStats.jsDivergencePairs(toks, groups, "src", vocabSize = 2)
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    // g1 ≡ g2 → exact zero (pa = pb per term, ln 1 = 0)
    assert(got(("g1", "g2")) === ((2L, 0L)))
    // g3 = {a:2}, g4 = {b:2}, smoothing K = 2: p = (2+1)/4 vs (0+1)/4
    // per term → t7 = round(5e6·(0.75·ln 1.5 + 0.25·ln 0.5)) each side
    val t7 = math.rint(5e6 *
      (0.75 * math.log(2.0 * 0.75 / 1.0) +
        0.25 * math.log(2.0 * 0.25 / 1.0))).toLong
    assert(got(("g3", "g4")) === ((2L, 2 * t7)))
    assert(t7 > 0L)
    // the mirrored pairs against g1 are symmetric: JSD(g1,g3) = JSD(g1,g4)
    assert(got(("g1", "g3"))._2 === got(("g1", "g4"))._2)
    assert(got.size === 6, "all unordered pairs emitted")
  }

  test("knBigramLogProb: hand-computed interpolated Kneser-Ney scores; continuation stats are type counts") {
    // corpus: "a b a b" + "a c" → bigram census {ab:2, ba:1, ac:1};
    // V = 3 unigram types, T = 3 bigram types;
    // lf: a → (cl 3, n1p 2), b → (cl 1, n1p 1);
    // rc: a/b/c → nc 1 each → p_cont = (1+1)/(3+3) = 1/3
    val docs = Seq((1L, "a b a b"), (2L, "a c")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val got = TextStats.knBigramLogProbFromTokens(toks, discount = 0.75)
      .orderBy(col("id"))
      .as[(Long, Long, Double)].collect().toSeq
    val pc = 2.0 / 6.0
    def lq(pkn: Double): Long = math.rint(math.log(pkn) * 1e4).toLong
    val ab = lq((math.max(2 - 0.75, 0) + 0.75 * 2 * pc) / 3.0) // c(ab)=2, cl(a)=3
    val ba = lq((math.max(1 - 0.75, 0) + 0.75 * 1 * pc) / 1.0) // = ln 0.5
    val ac = lq((math.max(1 - 0.75, 0) + 0.75 * 2 * pc) / 3.0)
    def avg(s: Long, n: Long): Double =
      BigDecimal(s.toDouble / (n * 1e4))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got === Seq(
      (1L, 3L, avg(2 * ab + ba, 3)),
      (2L, 1L, avg(ac, 1))))
    assert(ba === -6931L, "(0.25 + 0.25)/1 = 0.5 exactly")
    // KN's signature: "b a" (frequent continuation either way here)
    // scores above "a c" despite equal raw bigram counts — the left
    // context's mass differs
    assert(ba > ac)
  }

  test("textRank: adjacency dedup, self-pair drop, isolated teleport floor") {
    // "x x y" → self-pair (x,x) dropped, edge x—y kept once; "z" isolated.
    // Symmetric 2-cycle holds r = 1 forever → p = 1/3 each;
    // z never receives mass → r = 0.15 after round 1 → p = 0.05.
    val toks = Seq(
      (1L, Seq("x", "x", "y")),
      (2L, Seq("z"))).toDF("id", "ws")
    val out = TextStats.textRankFromTokens(toks, iters = 3,
        damping = 0.85, k = 10)
      .as[(String, Double)].collect().toSeq
    assert(out.map(_._1) === Seq("x", "y", "z")) // ties break word-ascending
    assert(math.abs(out(0)._2 - 1.0 / 3) < 1e-9)
    assert(math.abs(out(1)._2 - 1.0 / 3) < 1e-9)
    assert(math.abs(out(2)._2 - 0.15 / 3) < 1e-9)
    // k truncates the ranked list
    assert(TextStats.textRankFromTokens(toks, 3, 0.85, 2).count() === 2L)
  }
}
