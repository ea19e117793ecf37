package graft

import graft.functions.TextFunctions
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

class TextMultimodalSpec extends SparkSpec {
  import spark.implicits._

  test("tokens / counts / fingerprints") {
    val df = Seq("  the quick  brown fox  ").toDF("text")
    val r = df.select(
      TextFunctions.tokenCount(col("text")).as("n"),
      TextFunctions.bpeishTokenCount(lit("don't stop2")).as("bpe"),
      TextFunctions.fingerprint(col("text")).as("fp"),
      TextFunctions.fingerprint(lit("THE QUICK BROWN FOX")).as("fp2")).head()
    assert(r.getAs[Int]("n") === 4)
    // don / ' / t / stop / 2 → 5
    assert(r.getAs[Int]("bpe") === 5)
    assert(r.getAs[String]("fp") === r.getAs[String]("fp2"))
  }

  test("langId picks the language with most stopword hits, en wins ties") {
    val df = Seq(
      ("the cat and the dog of a house", "en"),
      ("der hund und die katze ist ein tier", "de"),
      ("el perro y la casa de los gatos que", "es"),
      ("xyzzy plugh qwerty", "unknown")).toDF("text", "expect")
    val out = df.select(TextFunctions.langId(col("text")).as("got"), col("expect"))
      .where(col("got") =!= col("expect")).count()
    assert(out === 0)
  }

  test("multimodal: SQL withMeta and per-partition FakeCodec agree exactly") {
    val blobs = Seq((1L, "hello world"), (2L, "some other doc"))
      .toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("blob"))
    val viaSql = Multimodal.withMeta(blobs, "blob", "txt")
      .select(col("id"), col("meta.width"), col("meta.height"),
        col("meta.n_bytes"), col("meta.checksum"))
      .as[(Long, Int, Int, Long, String)].collect().toSet
    val viaPartitions = Multimodal.decodePartitions(blobs, "blob", "id", "txt")
      .select(col("id"), col("width"), col("height"), col("n_bytes"), col("checksum"))
      .as[(Long, Int, Int, Long, String)].collect().toSet
    assert(viaSql === viaPartitions)
  }

  test("ImageIoCodec decodes REAL PNG and JPEG bytes per-partition (true header dims)") {
    // real image bytes generated in-test: BufferedImage → PNG/JPEG
    def jpegBytes(w: Int, h: Int): Array[Byte] = {
      val img = new java.awt.image.BufferedImage(
        w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
      val bos = new java.io.ByteArrayOutputStream()
      javax.imageio.ImageIO.write(img, "jpg", bos)
      bos.toByteArray
    }
    val blobs = Seq(
      (1L, Multimodal.encodePng(17, 9, seed = 1L)),
      (2L, Multimodal.encodePng(300, 200, seed = 2L)),
      (3L, jpegBytes(64, 48)),
      (4L, "not an image at all".getBytes("UTF-8"))
    ).toDF("id", "blob").repartition(3)   // spread across partitions
    val got = Multimodal.decodePartitions(blobs, "blob", "id", "img",
        Multimodal.ImageIoCodec)
      .select(col("id"), col("format"), col("width"), col("height"))
      .as[(Long, String, Int, Int)].collect()
      .map { case (id, f, w, h) => id -> ((f, w, h)) }.toMap
    assert(got(1L) === ("png", 17, 9))
    assert(got(2L) === ("png", 300, 200))
    assert(got(3L) === ("jpeg", 64, 48))
    // bad bytes degrade to a typed corrupt row, never a task throw
    assert(got(4L) === ("corrupt", -1, -1))
    // truncated real image: header gone → corrupt, no exception
    val trunc = Seq((5L, Multimodal.encodePng(40, 40, 5L).take(6)))
      .toDF("id", "blob")
    val t = Multimodal.decodePartitions(trunc, "blob", "id", "img",
        Multimodal.ImageIoCodec)
      .select(col("format")).as[String].head()
    assert(t === "corrupt")
  }

  test("WavCodec parses REAL RIFF headers per-partition; bad bytes degrade typed") {
    val blobs = Seq(
      (1L, Multimodal.encodeWav(16000, 1, 480, seed = 1L)),
      (2L, Multimodal.encodeWav(44100, 2, 1000, seed = 2L)),
      (3L, "RIFFxxxxNOPE".getBytes("US-ASCII")),            // bad magic
      (4L, "noise".getBytes("US-ASCII"))                    // too short
    ).toDF("id", "blob").repartition(2)
    val got = Multimodal.decodeAudioPartitions(blobs, "blob", "id", "wav",
        Multimodal.WavCodec)
      .select(col("id"), col("format"), col("sample_rate"), col("channels"),
        col("bits_per_sample"), col("n_frames"), col("n_bytes"))
      .as[(Long, String, Int, Int, Int, Long, Long)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(1L) === ((1L, "wav", 16000, 1, 16, 480L, 44L + 960L)))
    assert(got(2L) === ((2L, "wav", 44100, 2, 16, 1000L, 44L + 4000L)))
    assert(got(3L)._2 === "corrupt")
    assert(got(4L)._2 === "corrupt")
    // truncated mid-header and a lying chunk size: walk must terminate
    // in a typed corrupt row (no throw, no loop)
    val evil = Multimodal.encodeWav(8000, 1, 10, seed = 9L)
    val lying = evil.clone()
    // overwrite the fmt chunk size field (bytes 16..19) with 0xFFFFFFFF
    lying(16) = -1; lying(17) = -1; lying(18) = -1; lying(19) = -1
    val bad = Seq((5L, evil.take(20)), (6L, lying)).toDF("id", "blob")
    val badRows = Multimodal.decodeAudioPartitions(bad, "blob", "id", "wav",
        Multimodal.WavCodec)
      .select(col("format")).as[String].collect()
    assert(badRows.forall(_ === "corrupt"))
  }

  test("Mp4Codec walks REAL ISO-BMFF boxes; corrupt sizes terminate typed") {
    val blobs = Seq(
      (1L, Multimodal.encodeMp4(600, 1200L, 320, 240, nTracks = 1)),
      (2L, Multimodal.encodeMp4(1000, 2500L, 176, 144, nTracks = 3)),
      (3L, "ftypnotaboxatall".getBytes("US-ASCII"))
    ).toDF("id", "blob").repartition(2)
    val got = Multimodal.decodeVideoPartitions(blobs, "blob", "id", "mp4",
        Multimodal.Mp4Codec)
      .select(col("id"), col("format"), col("duration_ms"), col("width"),
        col("height"), col("n_tracks"))
      .as[(Long, String, Long, Int, Int, Int)].collect()
      .map(t => t._1 -> t).toMap
    assert(got(1L) === ((1L, "isom", 2000L, 320, 240, 1)))  // 1200/600 s
    assert(got(2L) === ((2L, "isom", 2500L, 176, 144, 3)))
    assert(got(3L)._2 === "corrupt")
    // lying top-level box size (bigger than the buffer): walk must stop
    val lying = Multimodal.encodeMp4(600, 600L, 64, 64, 1)
    lying(0) = 0x7f.toByte                       // ftyp size -> huge
    // truncated mid-moov: mvhd never completes -> corrupt
    val trunc = Multimodal.encodeMp4(600, 600L, 64, 64, 1).take(40)
    val bad = Seq((4L, lying), (5L, trunc)).toDF("id", "blob")
    val badRows = Multimodal.decodeVideoPartitions(bad, "blob", "id", "mp4",
        Multimodal.Mp4Codec)
      .select(col("format")).as[String].collect()
    assert(badRows.forall(_ === "corrupt"))
  }

  test("frame sampling emits stride-spaced indices bounded by pseudo frame count") {
    val blobs = Seq((1L, "x" * 10)).toDF("id", "text")
      .select(col("id"), encode(col("text"), "utf-8").as("blob"))
    val frames = Multimodal.sampleFrames(blobs, "blob", "id", stride = 2)
      .select("frame_idx").as[Int].collect().toSeq
    assert(frames === Seq(0, 2, 4, 6, 8, 10))  // n_frames = 10 % 32 + 1 = 11
  }

  test("PcmStatsCodec reads PCM16 frames exactly; hand-computed stats") {
    // encodeWav samples: ((seed + i*31) % 65536) - 32768 for i < frames*ch
    val seed = 7L
    val frames = 5
    val bytes = Multimodal.encodeWav(8000, channels = 2, nFrames = frames,
      seed = seed)
    val expect = (0 until frames * 2).map(i => ((seed + i * 31) % 65536) - 32768)
    val (f, ns, sq, nc, ma, nb, _) = Multimodal.PcmStatsCodec.stats(bytes)
    assert(f === "wav")
    assert(ns === expect.length.toLong)
    assert(sq === expect.map(v => v * v).sum)
    assert(nc === expect.count(v => math.abs(v) >= 32700).toLong)
    assert(ma === expect.map(v => math.abs(v).toInt).max)
    assert(nb === bytes.length.toLong)
    // clipAt is honored: every sample "clips" at threshold 0... except
    // exact zeros, so use 1 on an all-nonzero signal
    val (_, _, _, allClipped, _, _, _) =
      Multimodal.PcmStatsCodec.stats(bytes, clipAt = 0)
    assert(allClipped === ns)
  }

  test("PcmStatsCodec degrades typed: corrupt magic, lying data size, non-PCM16") {
    val good = Multimodal.encodeWav(8000, 1, 4, seed = 1L)
    val lying = good.clone()
    // data chunk size field at offset 40 (LE): claim far more than present
    val bb = java.nio.ByteBuffer.wrap(lying)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(40, Int.MaxValue)
    val cases = Seq(
      "no riff".getBytes("UTF-8"),
      good.take(10),
      lying)
    cases.foreach { b =>
      val (f, ns, _, _, _, _, _) = Multimodal.PcmStatsCodec.stats(b)
      assert(f === "corrupt" && ns === -1L)
    }
    // per-partition wrapper carries the typed rows through
    val df = Seq((1L, good), (2L, lying)).toDF("id", "blob")
    val rows = Multimodal.decodeAudioStatsPartitions(df, "blob", "id")
      .select("id", "format").as[(Long, String)].collect().toMap
    assert(rows(1L) === "wav" && rows(2L) === "corrupt")
  }

  test("DHashCodec: pixel-identical images hash equal; edits move few bits; corrupt typed") {
    def hash(b: Array[Byte]) = Multimodal.DHashCodec.dhash(b)
    val a = hash(Multimodal.encodePng(20, 16, seed = 3L))
    val b = hash(Multimodal.encodePng(20, 16, seed = 3L))
    assert(a._1 === "png" && a._2.length === 64)
    assert(a._2.forall(c => c == '0' || c == '1'))
    assert(a === b)                       // deterministic, byte-independent
    def hamming(x: String, y: String) = x.zip(y).count { case (i, j) => i != j }
    // identical-size, slightly-shifted gradient: small but nonzero distance
    // is the near-dup property we rely on (not asserted tightly — the
    // gradient is synthetic); pixel-identical is the exact contract.
    assert(hamming(a._2, b._2) === 0)
    // corrupt bytes and sub-grid images degrade typed
    assert(hash("junk".getBytes("UTF-8"))._1 === "corrupt")
    assert(hash(Multimodal.encodePng(8, 8, seed = 1L))._1 === "corrupt")
    // per-partition wrapper
    val df = Seq(
      (1L, Multimodal.encodePng(20, 16, seed = 3L)),
      (2L, Multimodal.encodePng(20, 16, seed = 3L)),
      (3L, "junk".getBytes("UTF-8"))).toDF("id", "blob").repartition(2)
    val out = Multimodal.decodeImageHashPartitions(df, "blob", "id")
      .select("id", "format", "dhash").as[(Long, String, String)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._1 === "png" && out(1L)._2 === out(2L)._2)
    assert(out(3L) === ("corrupt", null))
  }

  test("ChannelStatsCodec: exact integer channel sums; corrupt typed; wrapper carries rows") {
    // hand-computed against encodePng's pixel formula
    // v(x, y) = (seed + 31x + 131y) & 0xffffff
    val (w, h, seed) = (3, 2, 7L)
    var er = 0L; var eg = 0L; var eb = 0L
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 31L * x + 131L * y) & 0xffffff
      er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
    }
    val s = Multimodal.ChannelStatsCodec.stats(Multimodal.encodePng(w, h, seed))
    assert(s === ("png", w, h, (w * h).toLong, er, eg, eb))
    // corrupt bytes degrade typed, never throw
    assert(Multimodal.ChannelStatsCodec.stats("junk".getBytes("UTF-8"))._1
      === "corrupt")
    assert(Multimodal.ChannelStatsCodec
      .stats(Multimodal.encodePng(9, 9, 1L).take(6))._1 === "corrupt")
    // per-partition wrapper: typed rows for good AND corrupt blobs
    val df = Seq(
      (1L, Multimodal.encodePng(w, h, seed)),
      (2L, "junk".getBytes("UTF-8"))).toDF("id", "blob").repartition(2)
    val out = Multimodal.decodeImageChannelStatsPartitions(df, "blob", "id")
      .select("id", "format", "sum_r").as[(Long, String, Long)]
      .collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L) === ("png", er) && out(2L) === ("corrupt", -1L))
  }

  test("PatchStatsCodec: per-patch luma sums replay the pixel formula; mass conserved") {
    // 6x5 raster, 4x4 grid: patch = coord*4/dim integer division
    val (w, h, seed) = (6, 5, 11L)
    val exp = scala.collection.mutable.Map.empty[(Int, Int), (Long, Long)]
    for (y <- 0 until h; x <- 0 until w) {
      val v = (seed + 31L * x + 131L * y) & 0xffffff
      val luma = ((v >> 16) & 0xff) * 299L + ((v >> 8) & 0xff) * 587L +
        (v & 0xff) * 114L
      val k = (y * 4 / h, x * 4 / w)
      val (n0, s0) = exp.getOrElse(k, (0L, 0L))
      exp(k) = (n0 + 1, s0 + luma)
    }
    val (fmt, ww, hh, patches) = Multimodal.PatchStatsCodec
      .stats(Multimodal.encodePng(w, h, seed), 4)
    assert(fmt === "png" && ww === w && hh === h)
    assert(patches.map(p => (p._1, p._2) -> ((p._3, p._4))).toMap === exp.toMap)
    // mass conservation vs the channel-stats kernel
    val cs = Multimodal.ChannelStatsCodec.stats(Multimodal.encodePng(w, h, seed))
    assert(patches.map(_._3).sum === (w * h).toLong)
    assert(patches.map(_._4).sum === cs._5 * 299L + cs._6 * 587L + cs._7 * 114L)
    // corrupt degrades typed through the per-partition wrapper
    val df = Seq((1L, Multimodal.encodePng(w, h, seed)),
      (2L, "junk".getBytes("UTF-8"))).toDF("id", "blob")
    val out = Multimodal
      .decodeImagePatchStatsPartitions(df, "blob", "id", grid = 4)
      .groupBy("id", "format").count()
      .as[(Long, String, Long)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out(1L)._2 > 1L && out(2L) === (("corrupt", 1L)))
  }

  test("ThumbCodec: nearest-neighbor arithmetic exact; re-encode deterministic; corrupt typed") {
    // 8x8 source, 4x4 thumb → src = t*8/4 = 2t on both axes
    val (w, h, seed) = (8, 8, 5L)
    var er = 0L; var eg = 0L; var eb = 0L
    for (ty <- 0 until 4; tx <- 0 until 4) {
      val v = (seed + 31L * (tx * w / 4) + 131L * (ty * h / 4)) & 0xffffff
      er += (v >> 16) & 0xff; eg += (v >> 8) & 0xff; eb += v & 0xff
    }
    val blob = Multimodal.encodePng(w, h, seed)
    val s = Multimodal.ThumbCodec.thumbStats(blob, 4, 4)
    assert(s === ("png", w, h, er, eg, eb))
    // the re-encoded thumbnail is deterministic and itself decodes to
    // the same channel sums
    val t1 = Multimodal.ThumbCodec.thumbnailPng(blob, 4, 4)
    val t2 = Multimodal.ThumbCodec.thumbnailPng(blob, 4, 4)
    assert(java.util.Arrays.equals(t1, t2))
    val ts = Multimodal.ChannelStatsCodec.stats(t1)
    assert((ts._5, ts._6, ts._7) === ((er, eg, eb)))
    // corrupt and sub-thumbnail-sized degrade typed / null
    assert(Multimodal.ThumbCodec.thumbStats("junk".getBytes, 4, 4)._1
      === "corrupt")
    assert(Multimodal.ThumbCodec.thumbStats(
      Multimodal.encodePng(2, 2, 1L), 4, 4)._1 === "corrupt")
    assert(Multimodal.ThumbCodec.thumbnailPng("junk".getBytes, 4, 4) === null)
  }

  test("dHash signatures compose with banded Hamming pairing") {
    // Two pixel-identical images + one different gradient: the banded
    // pairer (q60 machinery over dhash-as-simhash64) must find exactly
    // the identical pair at distance 0 under a tight threshold.
    val df = Seq(
      (1L, Multimodal.encodePng(20, 16, seed = 9L)),
      (2L, Multimodal.encodePng(20, 16, seed = 9L)),
      (3L, Multimodal.encodePng(20, 16, seed = 9L, xCoef = 201L)))
      .toDF("id", "blob")
    val sigs = Multimodal.decodeImageHashPartitions(df, "blob", "id")
      .select(col("id"), col("dhash").as("simhash64"))
    val pairs = graft.operators.Dedup
      .hammingNearDupsFromSigs(sigs, maxHamming = 0)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(pairs === Set((1L, 2L, 0L)))
  }

  test("AudioSigCodec: energy-profile fingerprint — identical equal, offset near, corrupt typed") {
    def sig(b: Array[Byte]) = Multimodal.AudioSigCodec.signature(b)
    val a = sig(Multimodal.encodeWav(16000, 1, 300, seed = 11L))
    val b = sig(Multimodal.encodeWav(16000, 1, 300, seed = 11L))
    assert(a._1 === "wav" && a._2.length === 64)
    assert(a._2.forall(c => c == '0' || c == '1'))
    assert(a === b)
    // +1 DC offset: energies shift ~0.006%, order mostly preserved →
    // nonzero-but-small Hamming distance (the near-dup property)
    val c = sig(Multimodal.encodeWav(16000, 1, 300, seed = 12L))
    def hamming(x: String, y: String) = x.zip(y).count { case (i, j) => i != j }
    assert(hamming(a._2, c._2) <= 16)
    // corrupt cases: bad magic, truncated, and a signal under 65 samples
    assert(sig("nope".getBytes("UTF-8")) === (("corrupt", null)))
    assert(sig(Multimodal.encodeWav(16000, 1, 300, 1L).take(20)) === (("corrupt", null)))
    assert(sig(Multimodal.encodeWav(16000, 1, 32, 1L)) === (("corrupt", null)))
  }

  test("collapsed Hamming pairing ≡ direct banding on duplicated signatures") {
    // 3 signature groups with copies + two near signatures: the
    // exact-dup-collapse plan must produce the identical pair set.
    val sig0 = "0" * 64
    val sig1 = "1" + "0" * 63            // hamming 1 from sig0
    val sigF = "1" * 64                  // far from both
    val sigs = Seq(
      (1L, sig0), (2L, sig0), (3L, sig0),
      (4L, sig1), (5L, sig1),
      (6L, sigF), (7L, sigF)).toDF("id", "simhash64")
    val direct = graft.operators.Dedup
      .hammingNearDupsFromSigs(sigs, maxHamming = 2)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    val collapsed = graft.operators.Dedup
      .hammingNearDupsCollapsed(sigs, maxHamming = 2)
      .select("id_a", "id_b", "hamming").as[(Long, Long, Long)]
      .collect().toSet
    assert(collapsed === direct)
    // sanity: same-group pairs at 0, cross sig0↔sig1 at 1, sigF isolated
    assert(direct.contains((1L, 2L, 0L)) && direct.contains((4L, 5L, 0L)))
    assert(direct.contains((1L, 4L, 1L)) && direct.contains((6L, 7L, 0L)))
    assert(!direct.exists { case (a, b, _) => (a <= 5) != (b <= 5) && (a == 6L || a == 7L || b == 6L || b == 7L) })
    // the managed variant: same pairs, and release() is safe to call
    val (managed, release) = graft.operators.Dedup
      .hammingNearDupsCollapsedManaged(sigs, maxHamming = 2)
    assert(managed.select("id_a", "id_b", "hamming")
      .as[(Long, Long, Long)].collect().toSet === direct)
    release()
  }

  test("Mp4StatsCodec walks stts/stsz/stss exactly; lying tables degrade typed") {
    import graft.operators.Multimodal
    // per-sample stsz layout: n=10 frames, sizes 500 + (7*31 + i*97) % 1000,
    // stts runs (5 × 300, 5 × 364) over a 12000-tick timescale,
    // keyframes at 1,4,7,10
    val blob = Multimodal.encodeMp4Sampled(width = 320, height = 240,
      nFrames = 10, keyEvery = 3, trackTimescale = 12000,
      delta1 = 300, delta2 = 364, uniformSize = 0, seed = 7L)
    val sizes = (0 until 10).map(i => 500L + (7L * 31 + i * 97) % 1000)
    val (f, nf, dur, mean, mx, nk, kr) = Multimodal.Mp4StatsCodec.stats(blob)
    assert(f === "isom" && nf === 10L)
    assert(dur === (5L * 300 + 5L * 364) * 1000 / 12000)
    assert(mean === sizes.sum.toDouble / 10 && mx === sizes.max)
    assert(nk === 4L && kr === 0.4)
    // uniform stsz layout: every frame exactly 777 bytes
    val uni = Multimodal.encodeMp4Sampled(320, 240, 10, 3, 12000, 300, 364,
      uniformSize = 777, seed = 7L)
    val u = Multimodal.Mp4StatsCodec.stats(uni)
    assert(u._4 === 777.0 && u._5 === 777L && u._2 === 10L)
    // corrupt paths: truncation before the first box; a LYING container
    // whose stts total disagrees with the stsz count (bytes 16..19 of
    // the stts payload hold the first run's count — bump it)
    assert(Multimodal.Mp4StatsCodec.stats(blob.take(6))._1 === "corrupt")
    val lying = blob.clone()
    val sttsAt = {
      def find(pat: String) = (0 until lying.length - 4).find(i =>
        new String(lying, i, 4, "US-ASCII") == pat).get
      find("stts")
    }
    lying(sttsAt + 12 + 3) = (lying(sttsAt + 12 + 3) + 1).toByte
    assert(Multimodal.Mp4StatsCodec.stats(lying)._1 === "corrupt")
  }

  test("VideoSigCodec: frame-size profile — identical equal, shifted near, corrupt typed") {
    import graft.operators.Multimodal
    def mp4(seed: Long, n: Int = 100) = Multimodal.encodeMp4Sampled(
      320, 240, nFrames = n, keyEvery = 3, trackTimescale = 12000,
      delta1 = 300, delta2 = 364, uniformSize = 0, seed = seed)
    def sig(b: Array[Byte]) = Multimodal.VideoSigCodec.signature(b)
    val a = sig(mp4(6L)); val b = sig(mp4(6L))
    assert(a._1 === "isom" && a._2.length === 64)
    assert(a._2.forall(c => c == '0' || c == '1'))
    assert(a === b)
    // +31-per-size variant (seed 6 → 7 shifts every size by 31 mod
    // 1000): the cross-multiplied comparison cancels the additive part
    // exactly, so only modulus wraps flip bits → small nonzero distance
    val c = sig(mp4(7L))
    def hamming(x: String, y: String) = x.zip(y).count { case (i, j) => i != j }
    assert(hamming(a._2, c._2) <= 16)
    // corrupt: junk bytes, uniform stsz (flat profile), <65 samples
    assert(sig("nope".getBytes("UTF-8")) === (("corrupt", null)))
    assert(sig(Multimodal.encodeMp4Sampled(320, 240, 100, 3, 12000, 300,
      364, uniformSize = 777, seed = 6L)) === (("corrupt", null)))
    assert(sig(mp4(6L, n = 64)) === (("corrupt", null)))
  }

  test("KeyframeCodec: stss sample numbers exact; absent stss = all sync; corrupt typed") {
    import graft.operators.Multimodal
    val blob = Multimodal.encodeMp4Sampled(320, 240, nFrames = 10,
      keyEvery = 3, trackTimescale = 12000, delta1 = 300, delta2 = 364,
      uniformSize = 0, seed = 7L)
    val (f, nf, sync) = Multimodal.KeyframeCodec.keyframes(blob)
    assert(f === "isom" && nf === 10L)
    assert(sync.toSeq === Seq(1L, 4L, 7L, 10L))
    // the plain header-only generator has no stbl at all → corrupt
    assert(Multimodal.KeyframeCodec.keyframes(
      Multimodal.encodeMp4(600, 1200L, 320, 240, 1))._1 === "corrupt")
    assert(Multimodal.KeyframeCodec.keyframes(blob.take(6))._1 === "corrupt")
  }

  test("hammingDupGroups: one row per identical-signature class, member cap with overflow") {
    val sig0 = "0" * 64
    val sig1 = "1" + "0" * 63
    val lone = "1" * 64
    // class sig0 has 5 members (cap at 3 → 2 overflow); sig1 has 2;
    // `lone` has a single member → no row (not a duplicate class)
    val sigs = (Seq.tabulate(5)(i => (10L + i, sig0)) ++
      Seq((20L, sig1), (21L, sig1), (30L, lone))).toDF("id", "simhash64")
    val rows = graft.operators.Dedup.hammingDupGroups(sigs, maxMembers = 3)
      .select("simhash64", "rep_id", "n_members", "members", "n_overflow")
      .as[(String, Long, Long, Seq[Long], Long)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
    assert(rows.keySet === Set(sig0, sig1))
    assert(rows(sig0) === ((10L, 5L, Seq(10L, 11L, 12L), 2L)))
    assert(rows(sig1) === ((20L, 2L, Seq(20L, 21L), 0L)))
  }
}
