package graft

import graft.functions.TextFunctions
import graft.operators.{Dedup, Sampling, TextStats}
import org.apache.spark.sql.functions._

/** Round-4 curation operators: quality-aware canonical selection,
  * graded contamination, within-doc span dedup, DSIR importance
  * weights, robust length outliers. */
class CurationOpsSpec extends SparkSpec {
  import spark.implicits._

  private val docsDir = "/root/testdata/sf0.001"

  test("canonicalPerCluster: exactly one keeper per cluster, and it has max quality (min id on ties)") {
    val clusters = Seq(
      (1L, 1L), (2L, 1L), (3L, 1L),   // cluster 1
      (4L, 4L),                       // singleton
      (5L, 5L), (6L, 5L)              // tie on quality -> min id wins
    ).toDF("doc_id", "cluster_rep")
    val quality = Seq(
      (1L, 0.2), (2L, 0.9), (3L, 0.5),
      (4L, 0.1),
      (5L, 0.7), (6L, 0.7)).toDF("doc_id", "quality")
    val out = Dedup.canonicalPerCluster(clusters, quality,
        "doc_id", "cluster_rep", "quality")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(out === Map(1L -> false, 2L -> true, 3L -> false,
      4L -> true, 5L -> true, 6L -> false))
  }

  test("canonicalPerCluster: NULL quality never beats a scored copy; all-null cluster falls back to min id") {
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 3L), (4L, 3L))
      .toDF("doc_id", "cluster_rep")
    val quality = Seq((1L, Some(0.4)), (2L, None), (3L, None), (4L, None))
      .toDF("doc_id", "quality")
    val out = Dedup.canonicalPerCluster(clusters, quality,
        "doc_id", "cluster_rep", "quality")
      .collect().map(r => r.getAs[Long]("doc_id") -> r.getAs[Boolean]("keep"))
      .toMap
    assert(out === Map(1L -> true, 2L -> false,   // scored copy wins
      3L -> true, 4L -> false))                   // all-null: min id
  }

  test("meanPool skips null elements like avg (count per element, not per row)") {
    val df = Seq(
      (1L, Seq[java.lang.Float](2.0f, 1.0f)),
      (1L, Seq[java.lang.Float](null, 3.0f))).toDF("label", "embedding")
    val out = graft.operators.Embeddings.meanPool(df, "label", "embedding")
      .collect()
    assert(out.length === 1)
    // pos 0: mean of {2.0} = 2.0 (null skipped); pos 1: mean of {1,3} = 2.0
    assert(out(0).getAs[Seq[Double]]("pooled") === Seq(2.0, 2.0))
  }

  test("canonicalPerCluster on real clusters: one keeper per cluster; keeper quality is the cluster max") {
    val docs = Tables.documents(spark, docsDir)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val clusters = Dedup.dupClusters(docs, "doc_id",
      Dedup.jaccardPairsFromSets(sets, 0.8))
    val quality = docs.select(col("doc_id"),
      TextFunctions.qualityScore(col("text"), col("n_chars")).as("quality"))
    val out = Dedup.canonicalPerCluster(clusters, quality,
      "doc_id", "cluster_rep", "quality").cache()
    val perCluster = out.groupBy("cluster_rep")
      .agg(sum(when(col("keep"), 1).otherwise(0)).as("n_keep"),
        max(col("quality")).as("maxq"),
        max(when(col("keep"), col("quality"))).as("keptq"))
      .collect()
    assert(perCluster.nonEmpty)
    perCluster.foreach { r =>
      assert(r.getAs[Long]("n_keep") === 1L, s"cluster ${r.get(0)}")
      assert(r.getAs[Double]("keptq") === r.getAs[Double]("maxq"))
    }
    out.unpersist()
  }

  test("contaminationFraction: graded score, [0,1], consistent with the any-hit boolean") {
    val docs = Seq(
      (1L, "a b c d e f"),        // bench doc
      (2L, "a b c d x y z w"),    // partial overlap with bench
      (3L, "p q r s t u"),        // clean
      (4L, "a")                   // too short to shingle -> frac 0
    ).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(docs, "doc_id", "text", 3)
    val out = Dedup.contaminationFraction(
        docs.select(col("doc_id").as("id")), sets,
        sets.where(col("id") === 1L), minFrac = 0.2)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_grams"), r.getAs[Long]("n_hits"),
          r.getAs[Double]("frac_contaminated"), r.getAs[Boolean]("contaminated"))))
      .toMap
    assert(out(1L) === ((4L, 4L, 1.0, true)))        // bench vs itself
    assert(out(2L) === ((6L, 2L, 0.3333, true)))     // "a b c", "b c d" hit
    assert(out(3L) === ((4L, 0L, 0.0, false)))
    assert(out(4L) === ((0L, 0L, 0.0, false)))
    out.values.foreach(v => assert(v._3 >= 0.0 && v._3 <= 1.0))
  }

  test("intraDocChunkDedup: dedups within a doc only; idempotent") {
    val docs = Seq(
      (1L, "x y z x y z a b c"),     // repeated chunk inside one doc
      (2L, "x y z q r s")            // same chunk in ANOTHER doc survives
    ).toDF("doc_id", "text")
    val out = Dedup.intraDocChunkDedup(docs, "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_kept_chunks"), r.getAs[String]("dedup_text")))).toMap
    assert(out(1L) === ((2L, "x y z a b c")))
    assert(out(2L) === ((2L, "x y z q r s")))   // cross-doc dup untouched
    // idempotence: running again over the deduped text changes nothing
    val again = Dedup.intraDocChunkDedup(
        Dedup.intraDocChunkDedup(docs, "doc_id", "text", 3)
          .select(col("id").as("doc_id"), col("dedup_text").as("text")),
        "doc_id", "text", 3)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_kept_chunks"), r.getAs[String]("dedup_text")))).toMap
    assert(again === out)
  }

  test("dsirWeights: target-slice docs score higher on average than the rest") {
    val docs = Tables.documents(spark, docsDir)
    val w = Sampling.dsirWeights(docs, "doc_id", "text",
        target = col("source") === "src0", buckets = 4096)
      .join(docs.select(col("doc_id").as("id"), col("source")), "id")
    val avg2 = w.groupBy(col("source") === "src0")
      .agg(avg(col("dsir_logweight")).as("m"))
      .collect().map(r => r.getBoolean(0) -> r.getDouble(1)).toMap
    assert(avg2(true) > avg2(false),
      s"target mean ${avg2(true)} should exceed non-target ${avg2(false)}")
  }

  test("bigramLogProb: same unigrams, incoherent bigrams -> lower score") {
    // both docs share the unigram distribution {a x4, b x4}; doc 1's
    // bigrams are the corpus-dominant pattern, doc 2 mixes rare ones
    val docs = Seq(
      (1L, "a b a b a b a b"),
      (2L, "a a b b a b b a"),
      (3L, "a b a b a b a b")).toDF("doc_id", "text")
    val toks = TextStats.tokenized(docs, "doc_id", "text")
    val out = TextStats.bigramLogProbFromTokens(toks, lambda = 0.7)
      .collect().map(r => r.getAs[Long]("id") ->
        ((r.getAs[Long]("n_bigrams"), r.getAs[Double]("avg_logprob2")))).toMap
    assert(out(1L)._1 === 7L)
    assert(out(1L)._2 === out(3L)._2)          // identical docs, identical score
    assert(out(1L)._2 > out(2L)._2,
      s"coherent ${out(1L)._2} should beat incoherent ${out(2L)._2}")
  }

  test("temperatureSampleByTokens: tail stratum keeps a larger fraction than the head") {
    val docs = ((1 to 400).map(i => (i.toLong, "big", 100L)) ++
      (1 to 20).map(i => (1000L + i, "small", 100L)))
      .toDF("doc_id", "source", "n_toks")
    val kept = Sampling.temperatureSampleByTokens(
        docs, "doc_id", "source", "n_toks", targetFraction = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val bigFrac = kept.getOrElse("big", 0L).toDouble / 400
    val smallFrac = kept.getOrElse("small", 0L).toDouble / 20
    assert(smallFrac > bigFrac,
      s"temperature should flatten: small=$smallFrac big=$bigFrac")
    // determinism: same call, same keep set
    val again = Sampling.temperatureSampleByTokens(
        docs, "doc_id", "source", "n_toks", targetFraction = 0.5)
      .groupBy("source").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(again === kept)
  }

  test("lengthOutliers: extremes flagged, bulk not; robust_z null only when MAD=0") {
    val lens = Seq.tabulate(99)(i => (i.toLong, 100L + (i % 11))) :+ (999L, 100000L)
    val df = lens.toDF("doc_id", "n_chars")
    val out = TextStats.lengthOutliers(df, "doc_id", "n_chars", k = 3.0)
      .collect().map(r => r.getAs[Long]("id") -> r.getAs[Boolean]("is_outlier"))
      .toMap
    assert(out(999L) === true)
    assert(out.count(_._2) === 1)   // only the planted extreme
    // constant column -> MAD 0 -> no flags, z null
    val const = Seq((1L, 5L), (2L, 5L), (3L, 5L)).toDF("doc_id", "n_chars")
    val czero = TextStats.lengthOutliers(const, "doc_id", "n_chars")
      .collect()
    czero.foreach { r =>
      assert(!r.getAs[Boolean]("is_outlier"))
      assert(r.isNullAt(r.fieldIndex("robust_z")))
    }
  }

  test("pcaTopComponent: analytic eigenvectors on rank-1 and axis-aligned fixtures") {
    import graft.operators.Embeddings
    def pca(rows: Seq[Seq[Float]]) =
      Embeddings.pcaTopComponent(rows.toDF("embedding"), "embedding",
          dim = 2, iters = 20)
        .orderBy("pos")
        .as[(Int, Long, Long, Long, Long)].collect().toSeq
    // points on the line y = x: population cov = [[1.25,1.25],[1.25,1.25]],
    // top eigvec (1,1)/√2 with λ = 2.5 carrying ALL the variance
    val line = pca(Seq(Seq(1f, 1f), Seq(2f, 2f), Seq(3f, 3f), Seq(4f, 4f)))
    assert(line === Seq(
      (0, 707107L, 2500000L, 2500000L, 10000L),
      (1, 707107L, 2500000L, 2500000L, 10000L)))
    // variance only along x: cov = [[8/3, 0], [0, 0]] — the iteration
    // must rotate v0 = (1,1)/√2 onto the x axis in one step
    val axis = pca(Seq(Seq(0f, 5f), Seq(2f, 5f), Seq(4f, 5f)))
    assert(axis === Seq(
      (0, 1000000L, 2666667L, 2666667L, 10000L),
      (1, 0L, 2666667L, 2666667L, 10000L)))
    // isotropic square: every direction is an eigenvector with λ = 1 —
    // v0 must stay put and report exactly half the trace
    val iso = pca(Seq(Seq(1f, 1f), Seq(-1f, -1f), Seq(1f, -1f),
      Seq(-1f, 1f)))
    assert(iso === Seq(
      (0, 707107L, 1000000L, 2000000L, 5000L),
      (1, 707107L, 1000000L, 2000000L, 5000L)))
  }

  test("pcaComponents: deflation recovers the axis-aligned spectrum in order; real components orthogonal") {
    import graft.operators.Embeddings
    // cov = diag(4.5, 0.5): components (±1,0) λ=4.5 then (0,±1) λ=0.5
    val rows = Seq(Seq(3f, 0f), Seq(-3f, 0f), Seq(0f, 1f), Seq(0f, -1f))
    val out = Embeddings.pcaComponents(rows.toDF("embedding"),
        "embedding", dim = 2, nComp = 2, iters = 20)
      .orderBy("component", "pos")
      .as[(Int, Int, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0, 0, 1000000L, 4500000L, 5000000L, 9000L),
      (0, 1, 0L, 4500000L, 5000000L, 9000L),
      (1, 0, 0L, 500000L, 5000000L, 1000L),
      (1, 1, 1000000L, 500000L, 5000000L, 1000L)))
    // real embeddings: spectral order holds and the two loading
    // vectors are orthogonal to grid precision
    val emb = Tables.embeddings(spark, "/root/testdata/sf0.001")
      .where(col("label") === 0)
    val comps = Embeddings.pcaComponents(emb, "embedding", 64, 2, 20)
      .orderBy("component", "pos")
      .as[(Int, Int, Long, Long, Long, Long)].collect()
    val v1 = comps.filter(_._1 == 0).map(_._3)
    val v2 = comps.filter(_._1 == 1).map(_._3)
    val eig1 = comps.find(_._1 == 0).get._4
    val eig2 = comps.find(_._1 == 1).get._4
    assert(eig1 >= eig2, s"spectral order violated: $eig1 < $eig2")
    val dot = v1.zip(v2).map { case (a, b) => BigInt(a) * b }.sum
    // unit vectors on the 1e-6 grid have norm² ≈ 1e12. With 56 vectors,
    // 20 finite iterations, and re-grid rounding each rung, deflation
    // leaves ~1e-2 relative residue — assert cos(angle) < 2%, which a
    // random 64-dim pair (expected |cos| ≈ 1/8) fails decisively
    assert(dot.abs < BigInt("20000000000"),
      s"components not orthogonal: dot = $dot")
  }

  test("greedyMaxCoverage: marginal gain re-scoring, id tie-break, early stop") {
    // d1{a,b,c,d} d2{c,d,e} d3{e,f} d4{a,b}: greedy picks d1 (4), then
    // d3 (marginal 2 — d2's raw size 3 shrinks to 1 after d1); after
    // d1+d3 nothing is uncovered → the chain stops at 2 picks even at
    // k = 3 (a one-shot size top-k would have picked d2 second)
    val elems = Seq(
      1L -> "a", 1L -> "b", 1L -> "c", 1L -> "d",
      2L -> "c", 2L -> "d", 2L -> "e",
      3L -> "e", 3L -> "f",
      4L -> "a", 4L -> "b").toDF("id", "s")
    val out = Sampling.greedyMaxCoverage(elems, "id", "s", k = 3)
      .as[(Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq((1L, 1L, 4L, 4L), (2L, 3L, 2L, 6L)))
    // identical sets: the smaller id wins the tie, the loser adds zero
    val tie = Seq(7L -> "x", 5L -> "x").toDF("id", "s")
    assert(Sampling.greedyMaxCoverage(tie, "id", "s", k = 2)
      .as[(Long, Long, Long, Long)].collect().toSeq
      === Seq((1L, 5L, 1L, 1L)))
  }
}
