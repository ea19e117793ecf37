package graft

import graft.operators.{Embeddings, Similarity, TfIdf}
import org.apache.spark.sql.functions._

/** Product quantization, JL projection, and sparse hashed-TF cosine:
  * determinism, accuracy bounds, and hand-computed ground truth on the
  * driver's real embeddings/documents (sf0.001). */
class PqJlSparseSpec extends SparkSpec {
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"
  private val Dim = 64
  private val K = 10

  private lazy val emb = Tables.embeddings(spark, dir).cache()
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def resultSet(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select(col("query_id"), col("corpus_id")).as[(Long, Long)].collect().toSet

  // ------------------------------------------------------------------ PQ

  test("pqTrain is deterministic and shapes m × ksub × dim/m") {
    val a = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 4, ksub = 8, iters = 2)
    val b = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 4, ksub = 8, iters = 2)
    assert(a.length == 4)
    assert(a.forall(_.length == 8))
    assert(a.forall(_.forall(_.length == Dim / 4)))
    assert(a.map(_.map(_.toSeq).toSeq).toSeq == b.map(_.map(_.toSeq).toSeq).toSeq,
      "two identical training runs must produce identical codebooks")
  }

  test("pqEncode codes are in range and deterministic") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 4, ksub = 8, iters = 2)
    val codes = Similarity.pqEncode(emb, "vec_id", "embedding", books)
      .select(col("corpus_id").cast("long"), col("codes"))
      .as[(Long, Seq[Int])].collect()
    assert(codes.length == emb.count())
    assert(codes.forall(_._2.length == 4))
    assert(codes.forall(_._2.forall(c => c >= 0 && c < 8)))
  }

  test("ADC with exact re-rank recovers most brute-force neighbors; bigger refine never hurts") {
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 8, ksub = 16, iters = 3)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", books).cache()
    val truth = resultSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", K, Dim))
    val narrow = resultSet(Similarity.pqTopK(enc, books, queries, "vec_id", "embedding", K, refine = K))
    val wide = resultSet(Similarity.pqTopK(enc, books, queries, "vec_id", "embedding", K, refine = 100))
    val rNarrow = (narrow & truth).size.toDouble / truth.size
    val rWide = (wide & truth).size.toDouble / truth.size
    info(f"PQ recall@$K refine=$K: $rNarrow%.3f refine=100: $rWide%.3f")
    // near-uniform synthetic embeddings are PQ's hardest case (codes
    // carry little signal when there is no cluster structure); the
    // check is the refine monotonicity + a sanity floor, like LshRecallSpec
    assert(rWide >= rNarrow, "a larger exact-re-rank pool must not lose recall")
    assert(rWide > 0.3, s"PQ+re-rank recall unexpectedly low: $rWide")
    enc.unpersist()
  }

  test("annRecall: self-recall is 1.0, values lie in [0,1], and the IVF floor holds") {
    val truthDf = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", K, Dim)
    val self = Similarity.annRecall(truthDf, truthDf, K)
      .select(col("recall")).as[Double].collect()
    assert(self.nonEmpty && self.forall(_ == 1.0), "exact vs itself must be recall 1")
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents)
    val ivf = Similarity.ivfProbe(assigned, cents, queries,
      "vec_id", "embedding", K, nprobe = 4)
    val rec = Similarity.annRecall(truthDf, ivf, K)
      .select(col("recall")).as[Double].collect()
    assert(rec.length == self.length, "one recall row per query point")
    assert(rec.forall(r => r >= 0.0 && r <= 1.0))
    val mean = rec.sum / rec.length
    info(f"registry-style IVF mean recall@$K: $mean%.3f")
    assert(mean > 0.3, s"IVF mean recall floor violated: $mean")
  }

  test("ADC distance of a vector to its own codeword reconstruction is the reconstruction error (0 for a centroid)") {
    // build a corpus whose vectors ARE centroids of a trivial codebook:
    // with ksub = 1 every codeword is the subspace mean, so encoding is
    // all-zeros and ADC distance equals the distance to the mean vector
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 4, ksub = 1, iters = 1)
    val enc = Similarity.pqEncode(emb, "vec_id", "embedding", books)
    val codes = enc.select(col("codes")).as[Seq[Int]].head()
    assert(codes.forall(_ == 0), "ksub=1 must encode every vector to code 0")
  }

  test("IVF-PQ composes the two cuts: recall within the IVF envelope, deterministic") {
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, iters = 3)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents).cache()
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 8, ksub = 16, iters = 3)
    val indexed = Similarity.ivfPqEncode(assigned, books).cache()
    val truth = resultSet(Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", K, Dim))
    val ivfOnly = resultSet(Similarity.ivfProbe(assigned, cents, queries,
      "vec_id", "embedding", K, nprobe = 4))
    val ivfPq = resultSet(Similarity.ivfPqTopK(indexed, cents, books, queries,
      "vec_id", "embedding", K, nprobe = 4, refine = 100))
    val ivfPq2 = resultSet(Similarity.ivfPqTopK(indexed, cents, books, queries,
      "vec_id", "embedding", K, nprobe = 4, refine = 100))
    val rIvf = (ivfOnly & truth).size.toDouble / truth.size
    val rIvfPq = (ivfPq & truth).size.toDouble / truth.size
    info(f"recall@$K ivf(exact-scan)=$rIvf%.3f ivf-pq(adc+refine)=$rIvfPq%.3f")
    assert(ivfPq == ivfPq2, "IVF-PQ must be deterministic")
    // PQ only reorders WITHIN the probed lists, so IVF's list recall is
    // the ceiling; a wide refine pool should recover most of it
    assert(rIvfPq <= rIvf + 1e-9)
    assert(rIvfPq >= 0.5 * rIvf,
      s"ADC+refine lost too much of the IVF envelope: $rIvfPq vs $rIvf")
    indexed.unpersist(); assigned.unpersist()
  }

  test("contrastiveTriplets: positive shares the anchor label, negatives never do, margin is the cosine gap") {
    val labels = emb.select(col("vec_id").cast("long"), col("label"))
      .as[(Long, Int)].collect().toMap
    val rows = Similarity.contrastiveTriplets(emb, queries,
        "vec_id", "embedding", "label", kNeg = 3)
      .select(col("query_id").cast("long"), col("pos_id").cast("long"),
        col("neg_id").cast("long"), col("pos_cosine"), col("neg_cosine"),
        col("margin"))
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (qid, pid, nid, pc, nc, m) =>
      assert(labels(pid) == labels(qid), s"positive $pid must share label of $qid")
      assert(labels(nid) != labels(qid), s"negative $nid must differ in label from $qid")
      assert(pid != qid, "positive is never the anchor itself")
      assert(m == pc - nc)
    }
    assert(rows.groupBy(_._1).forall(_._2.map(_._2).distinct.size == 1),
      "exactly one positive per anchor")
  }

  test("IVF and PQ index models round-trip parquet bit-identically; a loaded index probes identically") {
    val cents = Similarity.ivfTrain(emb, "vec_id", "embedding", nlist = 8, iters = 2)
    val books = Similarity.pqTrain(emb, "vec_id", "embedding", Dim, m = 4, ksub = 8, iters = 2)
    val dir1 = java.nio.file.Files.createTempDirectory("ivfidx").toString
    val dir2 = java.nio.file.Files.createTempDirectory("pqidx").toString
    Similarity.ivfSave(spark, cents, dir1)
    Similarity.pqSave(spark, books, dir2)
    val cents2 = Similarity.ivfLoad(spark, dir1)
    val books2 = Similarity.pqLoad(spark, dir2)
    assert(cents.map { case (c, v) => (c, v.toSeq) }.toSeq ==
      cents2.map { case (c, v) => (c, v.toSeq) }.toSeq)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq ==
      books2.map(_.map(_.toSeq).toSeq).toSeq)
    val assigned = Similarity.ivfAssign(emb, "vec_id", "embedding", cents).cache()
    val a = resultSet(Similarity.ivfProbe(assigned, cents, queries,
      "vec_id", "embedding", K, nprobe = 3))
    val b = resultSet(Similarity.ivfProbe(assigned, cents2, queries,
      "vec_id", "embedding", K, nprobe = 3))
    assert(a == b, "a loaded index must probe identically to the trained one")
    assigned.unpersist()
  }

  // ------------------------------------------------------------------ JL

  test("jlProject approximately preserves squared norms (JL distortion)") {
    val n2In = emb.select(col("vec_id").cast("long").as("id"),
        graft.functions.VectorFunctions.normSq(col("embedding")).as("n2"))
      .as[(Long, Double)].collect().toMap
    val n2Out = Embeddings.jlProject(emb, "vec_id", "embedding", Dim, 16)
      .groupBy(col("vec_id")).agg(sum(col("y") * col("y")).as("n2"))
      .select(col("vec_id").cast("long"), col("n2"))
      .as[(Long, Double)].collect().toMap
    val ratios = n2In.keys.map(id => n2Out(id) / n2In(id)).toSeq
    val meanRatio = ratios.sum / ratios.size
    val meanAbsErr = ratios.map(r => math.abs(r - 1)).sum / ratios.size
    info(f"norm-ratio mean=$meanRatio%.3f mean|err|=$meanAbsErr%.3f")
    // E[ratio] = 1; distortion O(1/√16) per vector, so the corpus mean
    // must sit near 1 and the typical per-vector distortion well under 1
    assert(math.abs(meanRatio - 1) < 0.1, s"mean norm ratio off: $meanRatio")
    assert(meanAbsErr < 0.5, s"mean distortion too large: $meanAbsErr")
  }

  test("jl_project nulls the projection when any element is null (never reads garbage)") {
    graft.plans.JlProject.register(spark)
    val df = Seq(
      (1L, Seq[java.lang.Double](1.0, 2.0, 3.0, 4.0)),
      (2L, Seq[java.lang.Double](1.0, null, 3.0, 4.0))
    ).toDF("id", "v")
    val out = df.select(col("id"), call_function(
        graft.plans.JlProject.fnName, col("v"), lit(4), lit(4)).as("y"))
      .select(col("id"), col("y").isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && out(2L))
  }

  test("jl_project nulls the projection when the vector is shorter than dimIn") {
    graft.plans.JlProject.register(spark)
    val df = Seq(
      (1L, Seq(1.0, 2.0, 3.0, 4.0)),
      (2L, Seq(1.0, 2.0))                 // short: would read past the end
    ).toDF("id", "v")
    val out = df.select(col("id"), call_function(
        graft.plans.JlProject.fnName, col("v"), lit(4), lit(4)).as("y"))
      .select(col("id"), col("y").isNull.as("n"))
      .as[(Long, Boolean)].collect().toMap
    assert(!out(1L) && out(2L))
  }

  test("jlProject is the sign-matrix linear map (hand-check one coordinate)") {
    val signs = graft.plans.JlProject.signs(16, Dim)
    val v = emb.orderBy(col("vec_id")).select(col("embedding"))
      .as[Seq[Float]].head()
    var s = 0.0
    var i = 0
    while (i < Dim) { s += signs(3)(i) * v(i).toDouble; i += 1 }
    val expect = math.rint(s / 4.0 * 1e6) / 1e6   // √16 = 4; round 6 dp
    val got = Embeddings.jlProject(emb.orderBy(col("vec_id")).limit(1),
        "vec_id", "embedding", Dim, 16)
      .where(col("j") === 3).select(col("y")).as[Double].head()
    assert(math.abs(got - expect) < 1e-9, s"got $got want $expect")
  }

  // -------------------------------------------------- sparse cosine

  test("sparseCosineNearDups: identical token multisets score 1.0, disjoint ones never pair") {
    val toks = Seq(
      (1L, Seq("a", "b", "a", "c")),
      (2L, Seq("c", "a", "b", "a")),   // same multiset, different order → 1.0
      (3L, Seq("x", "y", "z")),        // disjoint from 1/2
      (4L, Seq("a", "b", "c"))         // same support as 1, different counts
    ).toDF("id", "ws")
    val pairs = Similarity.sparseCosineNearDups(
        TfIdf.hashedTf(toks, buckets = 1024), "id", "f", "tf",
        tau = 0.0, maxDocFreq = 10000)
      .select(col("id_a").cast("long"), col("id_b").cast("long"), col("cosine"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, c) => (a, b) -> c }.toMap
    assert(pairs((1L, 2L)) == 1.0, s"reordered multiset must score 1.0: ${pairs((1L, 2L))}")
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)),
      "disjoint docs share no feature, so no candidate pair")
    // doc 4 vs doc 1: dot = 2+1+1 = 4, |1|² = 4+1+1 = 6, |4|² = 3
    val expect = math.rint(4.0 / math.sqrt(18.0) * 1e6) / 1e6
    assert(pairs((1L, 4L)) == expect, s"count-weighted cosine: ${pairs((1L, 4L))} want $expect")
  }

  test("hashedDocEmbedding is the sign-weighted count sum (hand-check) and exact-dup docs coincide") {
    val toks = Seq(
      (1L, Seq("alpha", "beta", "alpha")),
      (2L, Seq("beta", "alpha", "alpha")),   // same multiset → identical embedding
      (3L, Seq("gamma"))
    ).toDF("id", "ws")
    val out = TfIdf.hashedDocEmbedding(TfIdf.hashedTf(toks, 256), 256, 16)
      .select(col("id").cast("long"), col("j"), col("y"))
      .as[(Long, Int, Double)].collect()
      .groupBy(_._1).map { case (id, rows) =>
        id -> rows.sortBy(_._2).map(_._3).toSeq
      }
    assert(out(1L) == out(2L), "same token multiset must embed identically")
    assert(out(1L) != out(3L))
    // hand-check doc 3: single token "gamma", tf = 1 → y_j = sign(j, f)/4
    val signs = graft.plans.JlProject.signs(16, 256)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("gamma".getBytes("UTF-8"))
      .take(2).map(b => f"$b%02x").mkString
    val f = Integer.parseInt(hex, 16) % 256
    val expect = (0 until 16).map(j => signs(j)(f) / 4.0)
    assert(out(3L) == expect, s"${out(3L)} != $expect")
  }

  test("sparseCosineNearDups drops features above maxDocFreq from the pruned space") {
    val toks = Seq(
      (1L, Seq("stop", "u1")),
      (2L, Seq("stop", "u2")),
      (3L, Seq("stop", "u3"))
    ).toDF("id", "ws")
    // "stop" appears in 3 docs; cap 2 removes it → remaining vectors are
    // disjoint singletons → no pairs at all
    val pairs = Similarity.sparseCosineNearDups(
      TfIdf.hashedTf(toks, buckets = 1024), "id", "f", "tf",
      tau = 0.0, maxDocFreq = 2)
    assert(pairs.count() == 0)
    // without the cap every pair shares exactly the stop feature
    val uncapped = Similarity.sparseCosineNearDups(
      TfIdf.hashedTf(toks, buckets = 1024), "id", "f", "tf",
      tau = 0.0, maxDocFreq = 10000)
    assert(uncapped.count() == 3)
  }
}
