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
