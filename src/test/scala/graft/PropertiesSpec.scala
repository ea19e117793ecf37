package graft

import graft.functions.TextFunctions
import graft.operators.Dedup
import graft.sources.JsonSerde
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based laws (SURVEY.md §5.2 #3): serde round-trips, filter
  * composition, dedup idempotence — plain ScalaCheck generators sampled
  * with fixed seeds (scalatest bridge artifact isn't available offline).
  */
class PropertiesSpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int): Seq[A] =
    (0 until n).flatMap(i => g.apply(Gen.Parameters.default, Seed(42L + i)))

  private val word = Gen.nonEmptyListOf(Gen.alphaLowerChar).map(_.mkString)
  private val doc = Gen.listOfN(8, word).map(_.mkString(" "))

  test("to_json ∘ from_json = id on generated payloads") {
    val schema = new StructType().add("source", "string").add("count", "long")
    for (recs <- samples(Gen.listOfN(20, Gen.zip(word, Gen.chooseNum(0L, 1000L))), 5)) {
      val json = recs.map { case (s, c) => s"""{"source":"$s","count":$c}""" }
      val round = JsonSerde.encode(
        JsonSerde.decode(json.toDF("value"), schema, JsonSerde.FailFast).select("value.*"))
      assert(round.as[String].collect().toSeq === json)
    }
  }

  test("filter(p) ∘ filter(q) ≡ filter(p && q)") {
    for (xs <- samples(Gen.listOfN(30, Gen.chooseNum(-100, 100)), 5)) {
      val df = xs.toDF("x")
      val a = df.filter(col("x") > 0).filter(col("x") % 2 === 0)
        .as[Int].collect().sorted.toSeq
      val b = df.filter(col("x") > 0 && col("x") % 2 === 0)
        .as[Int].collect().sorted.toSeq
      assert(a === b)
    }
  }

  test("exact dedup is idempotent and keeps one row per distinct content") {
    for (docs <- samples(Gen.listOfN(12, doc), 5)) {
      val df = docs.zipWithIndex.map { case (t, i) => (i.toLong, t) }
        .toDF("doc_id", "text")
      val once = Dedup.exact(df, "doc_id", "text")
      assert(once.count() ===
        docs.map(_.trim.toLowerCase.replaceAll("\\s+", " ")).distinct.size)
      val reps = once.select(col("keep_id").as("doc_id")).join(df, "doc_id")
      assert(Dedup.exact(reps, "doc_id", "text").count() === once.count())
    }
  }

  test("dupClusters equals union-find on random graphs") {
    val nVerts = 30
    val edgeGen = Gen.listOfN(25,
      Gen.zip(Gen.chooseNum(1L, nVerts.toLong), Gen.chooseNum(1L, nVerts.toLong)))
      .map(_.collect { case (a, b) if a != b => (math.min(a, b), math.max(a, b)) }.distinct)
    for (edges <- samples(edgeGen, 5)) {
      // driver-side union-find ground truth (min id as representative)
      val parent = scala.collection.mutable.Map((1L to nVerts).map(i => i -> i): _*)
      def find(x: Long): Long = if (parent(x) == x) x else { parent(x) = find(parent(x)); parent(x) }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val truth = (1L to nVerts).map(i => i -> find(i)).toMap

      val verts = (1L to nVerts).map(Tuple1(_)).toDF("id")
      val pairsDf =
        if (edges.isEmpty) Seq.empty[(Long, Long)].toDF("id_a", "id_b")
        else edges.toDF("id_a", "id_b")
      val out = Dedup.dupClusters(verts, "id", pairsDf)
        .as[(Long, Long)].collect().toMap
      assert(out === truth)
    }
  }

  test("temperature sampling flattens the mixture: tail keep-rate > head keep-rate") {
    import graft.operators.Sampling
    // head source 10x the tail source
    val df = ((1L to 2000L).map(i => (i, "head")) ++ (2001L to 2200L).map(i => (i, "tail")))
      .toDF("doc_id", "source")
    val kept = Sampling.temperatureSample(df, "doc_id", "source", targetFraction = 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    val rateHead = kept("head").toDouble / 2000
    val rateTail = kept("tail").toDouble / 200
    assert(rateTail > rateHead, s"tail $rateTail should exceed head $rateHead")
    val total = kept.values.sum.toDouble / 2200
    assert(total > 0.35 && total < 0.65, s"kept fraction $total far from target 0.5")
    // deterministic: identical result on rerun
    val again = Sampling.temperatureSample(df, "doc_id", "source", 0.5)
      .groupBy("source").count().as[(String, Long)].collect().toMap
    assert(again === kept)
  }

  test("chunkDedup is idempotent: after span dedup every surviving chunk is unique") {
    val docs = samples(Gen.listOfN(15, word), 12).zipWithIndex
      .map { case (ws, i) =>
        // force cross-doc duplicate spans by recycling a small word pool
        (i.toLong, ws.map(w => "w" + (w.hashCode.abs % 7)).mkString(" "))
      }.toDF("doc_id", "text")
    val once = Dedup.chunkDedup(docs, "doc_id", "text", 3)
    val twice = Dedup.chunkDedup(
      once.select(col("id").as("doc_id"), col("dedup_text").as("text")),
      "doc_id", "text", 3)
    val aRows = once.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val b = twice.collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).toSet
    // caveat: a doc's kept chunks re-chunk identically because every
    // kept chunk is exactly w words, so pass 2 sees the same spans —
    // all now globally unique
    assert(b === aRows.toSet)
    // and the first pass really removed something on this fixture
    // (sum over the ROW ARRAY — a Set of counts would collapse ties)
    val rawChunks = graft.operators.TextStats
      .posChunks(docs, "doc_id", "text", 3).count()
    assert(aRows.map(_._2).sum < rawChunks)
  }

  test("fingerprint ignores case/whitespace, distinguishes content") {
    for ((a, b) <- samples(Gen.zip(doc, doc), 8)) {
      val r = Seq((a, b)).toDF("a", "b").select(
        (TextFunctions.fingerprint(col("a")) ===
          TextFunctions.fingerprint(upper(concat(lit("  "), col("a"))))).as("same"),
        (TextFunctions.fingerprint(col("a")) ===
          TextFunctions.fingerprint(col("b"))).as("cross")).head()
      assert(r.getAs[Boolean]("same"))
      assert(r.getAs[Boolean]("cross") === (
        a.trim.toLowerCase.replaceAll("\\s+", " ") ==
          b.trim.toLowerCase.replaceAll("\\s+", " ")))
    }
  }

  test("sparseCosineNearDups ≡ naive in-memory hashed-count cosine on random corpora") {
    val docsGen = Gen.listOfN(12,
      Gen.zip(Gen.chooseNum(1L, 1000L), Gen.listOfN(10, word)))
      .map(_.distinctBy(_._1))
    def bucket(term: String): Int = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(term.getBytes("UTF-8"))
      ((((d(0) & 0xff) << 8) | (d(1) & 0xff)) % 4096)
    }
    for (docs <- samples(docsGen, 10)) {
      val df = docs.toDF("id", "ws")
      val got = graft.operators.Similarity.sparseCosineNearDups(
          graft.operators.TfIdf.hashedTf(df, 4096), "id", "f", "tf",
          tau = 0.0, maxDocFreq = 100000)
        .select(col("id_a").cast("long"), col("id_b").cast("long"), col("cosine"))
        .as[(Long, Long, Double)].collect()
        .map { case (a, b, c) => (a, b) -> c }.toMap
      // naive reimplementation with the same md5 feature hashing
      val vecs = docs.map { case (id, ws) =>
        id -> ws.groupBy(bucket).view.mapValues(_.size.toLong).toMap
      }.toMap
      val want = (for {
        a <- vecs.keys; b <- vecs.keys if a < b
        dot = vecs(a).keysIterator.filter(vecs(b).contains)
          .map(f => vecs(a)(f) * vecs(b)(f)).sum
        if dot > 0
      } yield {
        val na = vecs(a).values.map(v => v * v).sum
        val nb = vecs(b).values.map(v => v * v).sum
        (a, b) -> math.rint(dot / math.sqrt((na * nb).toDouble) * 1e6) / 1e6
      }).toMap
      assert(got == want, s"docs=$docs")
    }
  }

  test("pageRank conserves mass up to teleport leakage on random symmetric graphs") {
    val edgeGen = Gen.listOfN(15, Gen.zip(Gen.chooseNum(1L, 10L), Gen.chooseNum(1L, 10L)))
      .map(_.filter(e => e._1 != e._2).distinct)
    for (pairs <- samples(edgeGen, 8) if pairs.nonEmpty) {
      val vertices = (1L to 10L).toDF("id")
      val edges = (pairs ++ pairs.map(_.swap)).distinct.toDF("src", "dst")
      val connected = (pairs ++ pairs.map(_.swap)).map(_._1).toSet
      val p = graft.operators.GraphOps.pageRank(vertices, edges, iters = 2)
        .select(col("id").cast("long"), col("p")).as[(Long, Double)].collect().toMap
      // every vertex holds at least the teleport floor; total mass =
      // teleport + damped mass of contributing (non-isolated) vertices
      assert(p.values.forall(_ >= (1 - 0.85) / 10 - 1e-9))
      val iso = (1L to 10L).filterNot(connected)
      iso.foreach(v => assert(p(v) == (1 - 0.85) / 10))
      val total = p.values.sum * 10   // back to rank mass
      val bound = 10 * (1 - 0.85) + 0.85 * 10
      assert(total <= bound + 1e-6, s"mass created: $total > $bound")
    }
  }

  test("media kernels are TOTAL on arbitrary bytes (fuzz: no kernel ever throws)") {
    import graft.operators.Multimodal
    // random byte blobs, plus adversarial prefixes that get PAST each
    // kernel's magic check before the garbage starts
    val raw = Gen.chooseNum(0, 255).map(_.toByte)
    val junk = Gen.chooseNum(0, 64).flatMap(n => Gen.listOfN(n, raw)).map(_.toArray)
    val prefixes: Seq[Array[Byte]] = Seq(
      "RIFF".getBytes("US-ASCII"), "RIFFxxxxWAVE".getBytes("US-ASCII"),
      Array[Byte](0x89.toByte, 'P', 'N', 'G'),
      Array(0, 0, 0, 16).map(_.toByte) ++ "ftyp".getBytes("US-ASCII"))
    val blobs = samples(junk, 40) ++
      samples(Gen.zip(Gen.oneOf(prefixes), junk), 40)
        .map { case (p, j) => p ++ j }
    blobs.foreach { b =>
      // every kernel must return a typed row — never throw
      Multimodal.ImageIoCodec.probe(b, "img")
      Multimodal.WavCodec.probe(b, "wav")
      Multimodal.Mp4Codec.probe(b, "mp4")
      Multimodal.PcmStatsCodec.stats(b)
      Multimodal.DHashCodec.dhash(b)
      Multimodal.AudioSigCodec.signature(b)
      Multimodal.Mp4StatsCodec.stats(b)
      Multimodal.VideoSigCodec.signature(b)
      Multimodal.KeyframeCodec.keyframes(b)
      Multimodal.ChannelStatsCodec.stats(b)
      Multimodal.ThumbCodec.thumbStats(b, 4, 4)
      Multimodal.ThumbCodec.thumbnailPng(b, 4, 4)
      Multimodal.PatchStatsCodec.stats(b, 4)
      Multimodal.EdgeStatsCodec.stats(b)
      Multimodal.ZcrStatsCodec.stats(b)
    }
  }

  test("ZCR counts sign changes PER CHANNEL, not across the interleave") {
    import graft.operators.Multimodal
    // hand-rolled RIFF with explicit samples [100, -5, 3, -2, 7, 9]
    def wav(channels: Int, samples: Array[Int]): Array[Byte] = {
      val dataSize = samples.length * 2
      val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
        .put("WAVE".getBytes("US-ASCII"))
        .put("fmt ".getBytes("US-ASCII")).putInt(16)
        .putShort(1).putShort(channels.toShort).putInt(8000)
        .putInt(8000 * channels * 2).putShort((channels * 2).toShort)
        .putShort(16)
        .put("data".getBytes("US-ASCII")).putInt(dataSize)
      samples.foreach(s => bb.putShort(s.toShort))
      bb.array()
    }
    val samples = Array(100, -5, 3, -2, 7, 9)
    // mono: 100→-5, -5→3, 3→-2, -2→7 cross; 7→9 does not = 4 crossings
    val (f1, sr1, ch1, nf1, nc1, sa1) =
      Multimodal.ZcrStatsCodec.stats(wav(1, samples))
    assert((f1, sr1, ch1, nf1) === ("wav", 8000, 1, 6L))
    assert((nc1, sa1) === (4L, 126L))
    // stereo, same bytes: ch0 = [100, 3, 7] (0 crossings),
    // ch1 = [-5, -2, 9] (1 crossing) — interleave-adjacent sign flips
    // must NOT count
    val (f2, _, ch2, nf2, nc2, sa2) =
      Multimodal.ZcrStatsCodec.stats(wav(2, samples))
    assert((f2, ch2, nf2) === ("wav", 2, 3L))
    assert((nc2, sa2) === (1L, 126L))
    // corrupt degrades typed
    assert(Multimodal.ZcrStatsCodec.stats(Array[Byte](1, 2))._1
      === "corrupt")
  }

  test("Sobel edge stats: hand-computed 4x3 ramp + constant image is all-flat") {
    import graft.operators.Multimodal
    def gray(vals: Array[Array[Int]]): Array[Byte] = {
      val h = vals.length; val w = vals(0).length
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w) {
        val v = vals(y)(x)
        img.setRGB(x, y, (v << 16) | (v << 8) | v)
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(img, "png", ios) finally ios.close()
      bos.toByteArray
    }
    // columns v = [0, 10, 10, 40], three identical rows: luma = 1000·v.
    // interior (y=1): x=1 gx = (10+20+10)−0 = 40 → 40000, gy = 0;
    //                 x=2 gx = (40+80+40)−(10+20+10) = 120 → 120000.
    val ramp = gray(Array.fill(3)(Array(0, 10, 10, 40)))
    val (f, w, h, n, es, mx, nf) = Multimodal.EdgeStatsCodec.stats(ramp)
    assert((f, w, h) === ("png", 4, 3))
    assert((n, es, mx, nf) === (2L, 160000L, 120000L, 0L))
    // constant image: every interior gradient is exactly zero
    val flat = gray(Array.fill(5)(Array.fill(6)(77)))
    val (_, _, _, n2, es2, mx2, nf2) = Multimodal.EdgeStatsCodec.stats(flat)
    assert((n2, es2, mx2, nf2) === (12L, 0L, 0L, 12L))
    // corrupt bytes degrade typed
    assert(Multimodal.EdgeStatsCodec.stats(Array[Byte](1, 2, 3))._1
      === "corrupt")
  }

  test("edge stats are a function of PIXELS, not bytes: PNG and BMP equal") {
    import graft.operators.Multimodal
    for (seed <- 1L to 3L) {
      val w = (9 + seed % 23).toInt
      val h = (8 + (seed * 7) % 24).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((seed + x * 31L + y * 131L) & 0xffffff).toInt)
      def enc(fmt: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(img, fmt, ios) finally ios.close()
        bos.toByteArray
      }
      val sp = Multimodal.EdgeStatsCodec.stats(enc("png"))
      val sb = Multimodal.EdgeStatsCodec.stats(enc("bmp"))
      assert(sp._1 === "png" && sb._1 === "bmp")
      assert(sp.copy(_1 = "") === sb.copy(_1 = ""),
        s"seed $seed: edge stats differ across containers")
    }
  }

  test("channel sums are a function of PIXELS, not bytes: PNG and BMP sums equal") {
    import graft.operators.Multimodal
    for (seed <- 1L to 3L) {
      val w = (9 + seed % 23).toInt
      val h = (8 + (seed * 7) % 24).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((seed + x * 31L + y * 131L) & 0xffffff).toInt)
      def enc(fmt: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(img, fmt, ios) finally ios.close()
        bos.toByteArray
      }
      val sp = Multimodal.ChannelStatsCodec.stats(enc("png"))
      val sb = Multimodal.ChannelStatsCodec.stats(enc("bmp"))
      assert(sp._1 === "png" && sb._1 === "bmp")
      assert(sp.copy(_1 = "") === sb.copy(_1 = ""),
        s"seed $seed: channel sums differ across containers")
    }
  }

  test("dHash is a function of PIXELS, not bytes: PNG and BMP encodings hash equal") {
    // Same raster written through two lossless containers gives two very
    // different byte streams; the perceptual hash must not see the
    // difference. This is the property that makes dHash dedup catch
    // re-encoded copies exact-dedup misses.
    import graft.operators.Multimodal
    for (seed <- 1L to 5L) {
      val w = (9 + seed % 23).toInt
      val h = (8 + (seed * 7) % 24).toInt
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      for (y <- 0 until h; x <- 0 until w)
        img.setRGB(x, y, ((seed + x * 31L + y * 131L) & 0xffffff).toInt)
      def enc(fmt: String): Array[Byte] = {
        val bos = new java.io.ByteArrayOutputStream()
        val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
        try javax.imageio.ImageIO.write(img, fmt, ios) finally ios.close()
        bos.toByteArray
      }
      val png = enc("png")
      val bmp = enc("bmp")
      assert(!java.util.Arrays.equals(png, bmp))
      val hp = Multimodal.DHashCodec.dhash(png)
      val hb = Multimodal.DHashCodec.dhash(bmp)
      assert(hp._2 === hb._2, s"seed $seed: dHash differs across containers")
      assert(hp._1 === "png" && hb._1 === "bmp")
    }
  }
}
