package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal (image/audio/video) column handling.
  *
  * Design for 100 TB: media rides as opaque `binary` columns (or, above
  * ~1 MB per asset, as pointer structs to blob storage) next to a typed
  * metadata struct. All heavy decode work happens per-partition with
  * bounded batch sizes; everything before/after decode is ordinary
  * columnar Spark (prunable, predicate-pushable).
  *
  * Two codecs back the per-partition decode path: [[ImageIoCodec]] is a
  * REAL image probe (JDK `javax.imageio` — PNG/JPEG/GIF/BMP headers →
  * true format/width/height, no new dependencies), and [[FakeCodec]] is
  * the deterministic stand-in used where the payload is not an image
  * (the fixture corpus is text) or where the media library for a format
  * (video/audio) is not installed. Audio/video kernels would bind the
  * same [[Codec]] seam.
  */
object Multimodal {

  /** Metadata struct carried with every media blob. */
  val metaSchema: StructType = new StructType()
    .add("format", StringType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("n_bytes", LongType)
    .add("checksum", StringType)

  /** The decode-kernel seam: one blob in, one [[metaSchema]]-shaped
    * tuple out. Implementations MUST be deterministic, cheap on the
    * happy path (header probe, not full pixel decode, where the format
    * allows), and total (bad bytes → a typed "corrupt" row, never a
    * task-killing throw — at 100 TB some blobs WILL be truncated). */
  trait Codec extends Serializable {
    def probe(bytes: Array[Byte], formatHint: String): (String, Int, Int, Long, String)
  }

  /** Deterministic stand-in for a non-image decoder: derives pseudo
    * width/height from the content hash, real byte length + md5 checksum
    * from the bytes. The fixture path for payloads that are not real
    * media (and the template for binding ffmpeg-style codecs). */
  object FakeCodec extends Codec {
    def probe(bytes: Array[Byte], format: String): (String, Int, Int, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(bytes).map("%02x".format(_)).mkString
      // pseudo-dimensions from the first hash bytes — deterministic
      val w = 64 + (Integer.parseInt(digest.substring(0, 2), 16) % 16) * 64
      val h = 64 + (Integer.parseInt(digest.substring(2, 4), 16) % 16) * 64
      (format, w, h, bytes.length.toLong, digest)
    }
  }

  /** REAL image metadata decode via the JDK's `javax.imageio` (PNG,
    * JPEG, GIF, BMP — public knowledge, zero added dependencies): true
    * format name from the matched reader, true width/height from the
    * image HEADER (`ImageReader.getWidth/getHeight` read dimensions
    * without decoding pixel data — O(header), not O(pixels), exactly
    * what a 100 TB metadata pass wants). Unreadable/truncated bytes
    * degrade to format = "corrupt" with −1 dimensions — a typed row,
    * never a throw. */
  object ImageIoCodec extends Codec {
    def probe(bytes: Array[Byte], formatHint: String): (String, Int, Int, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(bytes).map("%02x".format(_)).mkString
      // MemoryCacheImageInputStream, NOT ImageIO.createImageInputStream:
      // the factory wraps InputStreams in a FileCacheImageInputStream by
      // default — a temp FILE per blob, ~1 ms of filesystem churn that
      // dominates header probing at millions of rows per executor.
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext)
          ("corrupt", -1, -1, bytes.length.toLong, digest)
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            (r.getFormatName.toLowerCase(java.util.Locale.ROOT),
              r.getWidth(0), r.getHeight(0), bytes.length.toLong, digest)
          } catch {
            case _: java.io.IOException =>
              ("corrupt", -1, -1, bytes.length.toLong, digest)
          } finally r.dispose()
        }
      } finally if (in != null) in.close()
    }
  }

  /** Deterministic in-memory PNG generator (`BufferedImage` →
    * `ImageIO.write`): REAL image bytes for specs and fixture queries —
    * pixel values derive from `seed` so the same call yields the same
    * image anywhere. Test/fixture generator, not a production operator. */
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] =
    encodePng(w, h, seed, xCoef = 31L)

  /** [[encodePng]] with a tunable x-gradient coefficient — a second
    * coefficient yields a DIFFERENT but visually similar image (same
    * dims, shifted gradient), the controlled near-duplicate for
    * perceptual-hash pairing fixtures. */
  def encodePng(w: Int, h: Int, seed: Long, xCoef: Long): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dimensions ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed + x * xCoef + y * 131L) & 0xffffff).toInt)
        x += 1
      }
      y += 1
    }
    val bos = new java.io.ByteArrayOutputStream()
    // Memory-cached output stream for the same reason as the probe path:
    // ImageIO.write(…, OutputStream) would spill through a temp file.
    val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
    try javax.imageio.ImageIO.write(img, "png", ios)
    finally ios.close()
    bos.toByteArray
  }

  /** Attach decoded metadata to a frame with a binary `blob` column.
    * Pure-column implementation (codegen'd) — the "decode" used here is
    * exactly [[FakeCodec]]'s arithmetic expressed in SQL so batch and
    * per-partition paths agree. */
  def withMeta(df: DataFrame, blobCol: String, format: String): DataFrame = {
    val checksum = md5(col(blobCol))
    val hx = (off: Int) => conv(substring(checksum, off, 2), 16, 10).cast("int")
    df.withColumn("meta", struct(
      lit(format).as("format"),
      (lit(64) + (hx(1) % 16) * 64).as("width"),
      (lit(64) + (hx(3) % 16) * 64).as("height"),
      length(col(blobCol)).cast("long").as("n_bytes"),
      checksum.as("checksum")))
  }

  /** Per-partition decode pipeline: iterate a partition, run the
    * [[Codec]] kernel on each blob, emit [[metaSchema]]-shaped rows.
    * Bounded memory per task regardless of partition size because the
    * iterator is streamed — one blob is in flight at a time. Pass
    * [[ImageIoCodec]] for real image payloads; the default [[FakeCodec]]
    * keeps non-media fixtures deterministic. */
  def decodePartitions(df: DataFrame, blobCol: String, idCol: String,
                       format: String, codec: Codec = FakeCodec): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_bytes", LongType).add("checksum", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, w, h, n, ck) = codec.probe(bytes, format)
        Row(r.getLong(idIdx), f, w, h, n, ck)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------------------- audio

  /** Metadata struct for audio blobs — the audio twin of [[metaSchema]].
    * `n_frames` is the sample-frame count (per channel), the honest unit
    * a pipeline derives duration from (`n_frames / sample_rate`). */
  val audioMetaSchema: StructType = new StructType()
    .add("format", StringType)
    .add("sample_rate", IntegerType)
    .add("channels", IntegerType)
    .add("bits_per_sample", IntegerType)
    .add("n_frames", LongType)
    .add("n_bytes", LongType)
    .add("checksum", StringType)

  /** Audio decode-kernel seam — same contract as [[Codec]]: deterministic,
    * header-only on the happy path, total (bad bytes → a typed "corrupt"
    * row). */
  trait AudioCodec extends Serializable {
    def probe(bytes: Array[Byte], formatHint: String)
        : (String, Int, Int, Int, Long, Long, String)
  }

  /** REAL WAV (RIFF) header parser — pure JDK byte arithmetic, no
    * dependencies: walks the chunk list, reads sample rate / channels /
    * bit depth from the `fmt ` chunk and the frame count from the `data`
    * chunk size, never touching the PCM payload (O(header), like
    * [[ImageIoCodec]]'s dimension probe). Truncated/malformed bytes —
    * short header, missing RIFF/WAVE magic, absent fmt/data chunks, or a
    * chunk running past the buffer — degrade to format = "corrupt" with
    * −1 fields, never a throw. */
  object WavCodec extends AudioCodec {
    private def corrupt(n: Long, ck: String) =
      ("corrupt", -1, -1, -1, -1L, n, ck)
    def probe(bytes: Array[Byte], formatHint: String)
        : (String, Int, Int, Int, Long, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val ck = md.digest(bytes).map("%02x".format(_)).mkString
      val n = bytes.length.toLong
      def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return corrupt(n, ck)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      // Long offset: a corrupt 32-bit chunk size must advance past the
      // buffer and end the walk, never wrap negative and loop.
      var off = 12L
      var rate, channels, bits = -1
      var dataSize = -1L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val id = ascii(o)
        val size = bb.getInt(o + 4).toLong & 0xffffffffL
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length) {
          channels = bb.getShort(o + 10) & 0xffff
          rate = bb.getInt(o + 12)
          bits = bb.getShort(o + 22) & 0xffff
        } else if (id == "data") dataSize = size
        off += 8 + size + (size & 1)               // chunks pad to even
      }
      if (rate <= 0 || channels <= 0 || bits <= 0 || dataSize < 0)
        corrupt(n, ck)
      else
        ("wav", rate, channels, bits,
          dataSize / (channels.toLong * (bits / 8).max(1)), n, ck)
    }
  }

  /** Deterministic in-memory PCM16 WAV generator — the audio sibling of
    * [[encodePng]]: real RIFF bytes whose samples derive from `seed`.
    * Test/fixture generator, not a production operator. */
  def encodeWav(sampleRate: Int, channels: Int, nFrames: Int,
                seed: Long): Array[Byte] = {
    require(sampleRate > 0 && channels > 0 && nFrames >= 0,
      s"bad wav params $sampleRate/$channels/$nFrames")
    val dataSize = nFrames * channels * 2
    val bb = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1)                       // PCM
      .putShort(channels.toShort)
      .putInt(sampleRate)
      .putInt(sampleRate * channels * 2) // byte rate
      .putShort((channels * 2).toShort)  // block align
      .putShort(16)                      // bits per sample
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    var i = 0
    while (i < nFrames * channels) {
      bb.putShort((((seed + i * 31L) % 65536L) - 32768L).toShort)
      i += 1
    }
    bb.array()
  }

  /** Per-partition audio decode — [[decodePartitions]] with the
    * [[audioMetaSchema]] row shape and an [[AudioCodec]] kernel. */
  def decodeAudioPartitions(df: DataFrame, blobCol: String, idCol: String,
                            format: String, codec: AudioCodec): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("sample_rate", IntegerType).add("channels", IntegerType)
      .add("bits_per_sample", IntegerType).add("n_frames", LongType)
      .add("n_bytes", LongType).add("checksum", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, sr, ch, bits, fr, n, ck) = codec.probe(bytes, format)
        Row(r.getLong(idIdx), f, sr, ch, bits, fr, n, ck)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Perceptual image hash — REAL pixel decode (`ImageIO.read`, full
    * raster, not just the header) followed by a deterministic dHash:
    * the image is box-averaged onto a 9×8 luma grid and each of the 64
    * bits records whether a cell is brighter than its left neighbor.
    * Identical images hash identically; small edits flip few bits, so
    * Hamming distance over the 64-bit string gives near-duplicate
    * detection for image corpora — the visual analog of SimHash, and
    * the output plugs straight into the existing banded
    * `hamming_dist` pairing machinery.
    *
    * Exactness contract (what makes this oracle-able): the downscale
    * is OUR integer arithmetic, not a library scaler — cell boundaries
    * are `floor(g·dim/grid)`, luma is the integer BT.601 weighting
    * (299·r + 587·g + 114·b, NO division), and the brighter-than
    * comparison cross-multiplies sums and counts
    * (s₂·c₁ > s₁·c₂ ⟺ avg₂ > avg₁) so no float rounding exists
    * anywhere. PNG is lossless, so decoded pixels equal generated
    * pixels bit-for-bit and the whole pipeline replays in SQL.
    *
    * Images narrower than the 9×8 grid would produce empty cells —
    * degraded to the typed corrupt row, like unreadable bytes.
    * O(pixels) per blob, zero shuffle. */
  object DHashCodec extends Serializable {
    /** (true reader format, dhash 64-char '0'/'1' string, or
      * (corrupt, null)) — the hash is a function of PIXELS, so PNG and
      * BMP encodings of the same raster hash identically (the property
      * that catches re-encoded copies exact dedup misses; asserted in
      * PropertiesSpec). */
    def dhash(bytes: Array[Byte]): (String, String) = {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val (fmt, img) =
        try {
          val readers = javax.imageio.ImageIO.getImageReaders(in)
          if (!readers.hasNext) (null, null)
          else {
            val r = readers.next()
            try {
              r.setInput(in)
              (r.getFormatName.toLowerCase(java.util.Locale.ROOT), r.read(0))
            } catch {
              case _: java.io.IOException => (null, null)
            } finally r.dispose()
          }
        } finally {
          try in.close()
          catch { case _: java.io.IOException => () }
        }
      if (img == null) return ("corrupt", null)
      val w = img.getWidth
      val h = img.getHeight
      if (w < 9 || h < 8) return ("corrupt", null)
      val s = Array.ofDim[Long](8, 9)
      val c = Array.ofDim[Long](8, 9)
      var gy = 0
      while (gy < 8) {
        val y0 = gy * h / 8; val y1 = (gy + 1) * h / 8
        var gx = 0
        while (gx < 9) {
          val x0 = gx * w / 9; val x1 = (gx + 1) * w / 9
          var sum = 0L; var cnt = 0L
          var y = y0
          while (y < y1) {
            var x = x0
            while (x < x1) {
              val m = img.getRGB(x, y) & 0xffffff
              sum += ((m >> 16) & 0xff) * 299L + ((m >> 8) & 0xff) * 587L +
                (m & 0xff) * 114L
              cnt += 1
              x += 1
            }
            y += 1
          }
          s(gy)(gx) = sum; c(gy)(gx) = cnt
          gx += 1
        }
        gy += 1
      }
      val sb = new java.lang.StringBuilder(64)
      gy = 0
      while (gy < 8) {
        var gx = 0
        while (gx < 8) {
          val brighter =
            s(gy)(gx + 1) * c(gy)(gx) > s(gy)(gx) * c(gy)(gx + 1)
          sb.append(if (brighter) '1' else '0')
          gx += 1
        }
        gy += 1
      }
      (fmt, sb.toString)
    }
  }

  /** Per-partition perceptual-hash decode — [[decodePartitions]] with
    * the [[DHashCodec]] kernel: (id, format, dhash). */
  def decodeImageHashPartitions(df: DataFrame, blobCol: String,
                                idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("dhash", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, dh) = DHashCodec.dhash(bytes)
        Row(r.getLong(idIdx), f, dh)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-channel pixel statistics — the color-profile kernel beside
    * [[DHashCodec]]'s structure hash: exact integer channel sums over
    * the full raster (means/derived stats are downstream arithmetic,
    * so every aggregate stays order-free). The corpus-level census
    * over these is the color-cast / tint-drift detector (a camera
    * pipeline change or a broken thumbnailer shifts a whole source's
    * channel balance). Pixels-not-bytes like the dHash: re-encodings
    * of one raster report identical sums. Undecodable blobs degrade
    * to the typed corrupt row, never a throw. */
  object ChannelStatsCodec extends Serializable {
    /** Shared safe decode: (formatName, raster) or (null, null) for
      * anything undecodable. */
    private[operators] def decode(bytes: Array[Byte])
        : (String, java.awt.image.BufferedImage) = {
      val in = new javax.imageio.stream.MemoryCacheImageInputStream(
        new java.io.ByteArrayInputStream(bytes))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(in)
        if (!readers.hasNext) (null, null)
        else {
          val r = readers.next()
          try {
            r.setInput(in)
            (r.getFormatName.toLowerCase(java.util.Locale.ROOT), r.read(0))
          } catch {
            case _: java.io.IOException => (null, null)
          } finally r.dispose()
        }
      } finally {
        try in.close()
        catch { case _: java.io.IOException => () }
      }
    }

    /** (format, width, height, n_px, sum_r, sum_g, sum_b); corrupt →
      * ("corrupt", -1, -1, -1, -1, -1, -1). */
    def stats(bytes: Array[Byte])
        : (String, Int, Int, Long, Long, Long, Long) = {
      val (fmt, img) = decode(bytes)
      if (img == null) return ("corrupt", -1, -1, -1L, -1L, -1L, -1L)
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val m = img.getRGB(x, y) & 0xffffff
          sr += (m >> 16) & 0xff
          sg += (m >> 8) & 0xff
          sb += m & 0xff
          x += 1
        }
        y += 1
      }
      (fmt, w, h, w.toLong * h, sr, sg, sb)
    }
  }

  /** Patch-grid luma statistics — the ViT-preprocessing shape over the
    * decoded raster: pixels quantize onto a G×G patch grid
    * (`patch = coord·G / dim`, integer division — the canonical
    * quantization, oracle-replayable per pixel) and each patch reports
    * its exact pixel count and BT.601 integer luma sum
    * (299·r + 587·g + 114·b milli-units, NO division — the q120 dHash
    * weighting). Per-patch means and their spread are the flat-image /
    * letterbox / watermark-block discard signals a vision-corpus
    * curation pass reads, and the patch grid is exactly what a
    * patch-embedding exporter would tokenize. Undecodable blobs
    * degrade to one typed corrupt row. */
  object PatchStatsCodec extends Serializable {
    /** (format, width, height, patches[(py, px, n_px, sum_luma_m)]);
      * corrupt → ("corrupt", -1, -1, empty). */
    def stats(bytes: Array[Byte], grid: Int)
        : (String, Int, Int, Array[(Int, Int, Long, Long)]) = {
      val (fmt, img) = ChannelStatsCodec.decode(bytes)
      if (img == null) return ("corrupt", -1, -1, Array.empty)
      val w = img.getWidth
      val h = img.getHeight
      val n = new Array[Long](grid * grid)
      val s = new Array[Long](grid * grid)
      var y = 0
      while (y < h) {
        val py = y * grid / h
        var x = 0
        while (x < w) {
          val px = x * grid / w
          val m = img.getRGB(x, y) & 0xffffff
          val luma = ((m >> 16) & 0xff) * 299L + ((m >> 8) & 0xff) * 587L +
            (m & 0xff) * 114L
          val i = py * grid + px
          n(i) += 1
          s(i) += luma
          x += 1
        }
        y += 1
      }
      val out = Array.newBuilder[(Int, Int, Long, Long)]
      var i = 0
      while (i < grid * grid) {
        if (n(i) > 0) out += ((i / grid, i % grid, n(i), s(i)))
        i += 1
      }
      (fmt, w, h, out.result())
    }
  }

  /** Per-partition patch-grid decode: one row per NONEMPTY patch
    * `(id, format, width, height, py, px, n_px, sum_luma)`; a corrupt
    * blob yields one typed row with patch coords −1. Zero shuffle —
    * the [[decodeImageChannelStatsPartitions]] contract with a
    * patch-exploded output (≤ grid² rows per image). */
  def decodeImagePatchStatsPartitions(df: DataFrame, blobCol: String,
                                      idCol: String,
                                      grid: Int = 4): DataFrame = {
    require(grid >= 1, "grid must be positive")
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("width", IntegerType).add("height", IntegerType)
      .add("py", IntegerType).add("px", IntegerType)
      .add("n_px", LongType).add("sum_luma", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val id = r.getLong(idIdx)
        val (f, w, h, patches) = PatchStatsCodec.stats(bytes, grid)
        if (patches.isEmpty) Iterator(Row(id, f, w, h, -1, -1, -1L, -1L))
        else patches.iterator.map { case (py, px, n, s) =>
          Row(id, f, w, h, py, px, n, s)
        }
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Sobel edge-energy kernel — the sharpness/flatness discard signal
    * of an image-curation pass: decode the raster, take the integer
    * BT.601 luma (299·r + 587·g + 114·b milli-units — the q120/q232
    * weighting, no division), convolve the interior with the two 3×3
    * Sobel kernels, and report the exact gradient-magnitude proxy
    * Σ(|Gx| + |Gy|) plus the peak gradient and the flat-pixel count
    * (|Gx| + |Gy| = 0). A screenshot of a solid color, a letterboxed
    * frame, or a blurred thumbnail all sit at the low-energy end; a
    * natural photo does not — this is the standard cheap blur/flat
    * filter a vision-corpus pipeline runs before any model scoring.
    * Pure integer arithmetic end to end, so an oracle can replay the
    * convolution term-for-term from the generator's pixel formula.
    * Undecodable blobs degrade to the typed corrupt row; a decodable
    * image thinner than 3 px simply has no interior (n_interior = 0). */
  object EdgeStatsCodec extends Serializable {
    /** (format, width, height, n_interior, edge_sum, max_grad, n_flat);
      * corrupt → ("corrupt", -1, -1, -1, -1, -1, -1). */
    def stats(bytes: Array[Byte]): (String, Int, Int, Long, Long, Long, Long) = {
      val (fmt, img) = ChannelStatsCodec.decode(bytes)
      if (img == null) return ("corrupt", -1, -1, -1L, -1L, -1L, -1L)
      val w = img.getWidth
      val h = img.getHeight
      val lum = new Array[Long](w * h)
      var y = 0
      while (y < h) {
        var x = 0
        while (x < w) {
          val m = img.getRGB(x, y) & 0xffffff
          lum(y * w + x) = ((m >> 16) & 0xff) * 299L +
            ((m >> 8) & 0xff) * 587L + (m & 0xff) * 114L
          x += 1
        }
        y += 1
      }
      var n = 0L; var es = 0L; var mx = 0L; var nf = 0L
      y = 1
      while (y < h - 1) {
        var x = 1
        while (x < w - 1) {
          val tl = lum((y - 1) * w + (x - 1)); val tc = lum((y - 1) * w + x)
          val tr = lum((y - 1) * w + (x + 1)); val ml = lum(y * w + (x - 1))
          val mr = lum(y * w + (x + 1));       val bl = lum((y + 1) * w + (x - 1))
          val bc = lum((y + 1) * w + x);       val br = lum((y + 1) * w + (x + 1))
          val gx = tr + 2L * mr + br - tl - 2L * ml - bl
          val gy = bl + 2L * bc + br - tl - 2L * tc - tr
          val e = math.abs(gx) + math.abs(gy)
          n += 1; es += e
          if (e > mx) mx = e
          if (e == 0L) nf += 1
          x += 1
        }
        y += 1
      }
      (fmt, w, h, n, es, mx, nf)
    }
  }

  /** Per-partition Sobel edge-stats decode — [[decodePartitions]] with
    * the [[EdgeStatsCodec]] kernel:
    * (id, format, width, height, n_interior, edge_sum, max_grad,
    * n_flat). Zero shuffle, O(pixels) per blob. */
  def decodeImageEdgeStatsPartitions(df: DataFrame, blobCol: String,
                                     idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_interior", LongType).add("edge_sum", LongType)
      .add("max_grad", LongType).add("n_flat", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, w, h, n, es, mx, nf) = EdgeStatsCodec.stats(bytes)
        Row(r.getLong(idIdx), f, w, h, n, es, mx, nf)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Nearest-neighbor thumbnail kernel — the TRANSFORM face of the
    * image family (probe/dHash/channel-stats only read): decode the
    * raster, sample a tw×th thumbnail with the canonical
    * `src = ⌊t·W/tw⌋` nearest-neighbor map (pure integer arithmetic —
    * replayable by an oracle, unlike interpolating resamplers), and
    * report the thumbnail's exact channel sums. The thumbnail bytes
    * themselves are deterministic too ([[thumbnailPng]]) — the
    * re-encode path a media pipeline writes back to storage.
    * Undecodable or sub-thumbnail-sized blobs degrade typed. */
  object ThumbCodec extends Serializable {
    /** (format, src_w, src_h, sum_r, sum_g, sum_b) of the tw×th
      * nearest-neighbor thumbnail; corrupt / too small →
      * ("corrupt", -1, -1, -1, -1, -1). */
    def thumbStats(bytes: Array[Byte], tw: Int, th: Int)
        : (String, Int, Int, Long, Long, Long) = {
      require(tw >= 1 && th >= 1, s"bad thumb dims ${tw}x$th")
      val (fmt, img) = ChannelStatsCodec.decode(bytes)
      if (img == null || img.getWidth < tw || img.getHeight < th)
        return ("corrupt", -1, -1, -1L, -1L, -1L)
      val w = img.getWidth
      val h = img.getHeight
      var sr = 0L; var sg = 0L; var sb = 0L
      var ty = 0
      while (ty < th) {
        val sy = ty * h / th
        var tx = 0
        while (tx < tw) {
          val m = img.getRGB(tx * w / tw, sy) & 0xffffff
          sr += (m >> 16) & 0xff
          sg += (m >> 8) & 0xff
          sb += m & 0xff
          tx += 1
        }
        ty += 1
      }
      (fmt, w, h, sr, sg, sb)
    }

    /** The tw×th nearest-neighbor thumbnail re-encoded as PNG bytes —
      * deterministic (same blob → identical bytes), null on corrupt. */
    def thumbnailPng(bytes: Array[Byte], tw: Int, th: Int): Array[Byte] = {
      val (_, img) = ChannelStatsCodec.decode(bytes)
      if (img == null || img.getWidth < tw || img.getHeight < th) return null
      val out = new java.awt.image.BufferedImage(
        tw, th, java.awt.image.BufferedImage.TYPE_INT_RGB)
      var ty = 0
      while (ty < th) {
        var tx = 0
        while (tx < tw) {
          out.setRGB(tx, ty,
            img.getRGB(tx * img.getWidth / tw, ty * img.getHeight / th)
              & 0xffffff)
          tx += 1
        }
        ty += 1
      }
      val bos = new java.io.ByteArrayOutputStream()
      val ios = new javax.imageio.stream.MemoryCacheImageOutputStream(bos)
      try javax.imageio.ImageIO.write(out, "png", ios) finally ios.close()
      bos.toByteArray
    }
  }

  /** Per-partition thumbnail-stats decode:
    * (id, format, src_w, src_h, sum_r, sum_g, sum_b). */
  def decodeThumbStatsPartitions(df: DataFrame, blobCol: String,
                                 idCol: String, tw: Int, th: Int)
      : DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("src_w", IntegerType).add("src_h", IntegerType)
      .add("sum_r", LongType).add("sum_g", LongType).add("sum_b", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, w, h, sr, sg, sb) = ThumbCodec.thumbStats(bytes, tw, th)
        Row(r.getLong(idIdx), f, w, h, sr, sg, sb)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition channel-stats decode — [[decodePartitions]] with
    * the [[ChannelStatsCodec]] kernel:
    * (id, format, width, height, n_px, sum_r, sum_g, sum_b). */
  def decodeImageChannelStatsPartitions(df: DataFrame, blobCol: String,
                                        idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("width", IntegerType).add("height", IntegerType)
      .add("n_px", LongType).add("sum_r", LongType)
      .add("sum_g", LongType).add("sum_b", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, w, h, n, sr, sg, sb) = ChannelStatsCodec.stats(bytes)
        Row(r.getLong(idIdx), f, w, h, n, sr, sg, sb)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Audio SAMPLE decode — the step past [[WavCodec]]'s header probe:
    * walks the RIFF chunks to the `data` payload and iterates the
    * PCM16 frames themselves, producing the exact integer signal
    * statistics an audio-curation pass filters on — total samples,
    * energy (sum of squares — kept as the exact integer so no sqrt
    * enters the comparison), clipped-sample count (|s| ≥ `clipAt`),
    * and peak amplitude. Silence (near-zero energy) and clipping
    * (high clip fraction) are the two standard discard signals for
    * recorded-speech corpora. Only uncompressed PCM16 is decodable
    * here; anything else — malformed RIFF, other bit depths, a `data`
    * chunk overrunning the buffer — degrades to the typed corrupt row
    * (format = "corrupt", −1 fields), never a throw.
    *
    * O(samples) per blob, zero shuffle, streamed one blob at a time —
    * unlike the header probes this one READS the payload, which is the
    * point: it is the template for any sample-level kernel (loudness
    * normalization, VAD, resampling) at 100 TB. */
  object PcmStatsCodec extends Serializable {
    private def corrupt(n: Long, ck: String) =
      ("corrupt", -1L, -1L, -1L, -1, n, ck)
    /** (format, n_samples, sum_sq, n_clipped, max_abs, n_bytes, checksum) */
    def stats(bytes: Array[Byte], clipAt: Int = 32700)
        : (String, Long, Long, Long, Int, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val ck = md.digest(bytes).map("%02x".format(_)).mkString
      val n = bytes.length.toLong
      def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return corrupt(n, ck)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12L
      var bits = -1
      var dataOff = -1L
      var dataSize = -1L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val id = ascii(o)
        val size = bb.getInt(o + 4).toLong & 0xffffffffL
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length)
          bits = bb.getShort(o + 22) & 0xffff
        else if (id == "data") { dataOff = off + 8; dataSize = size }
        off += 8 + size + (size & 1)
      }
      // PCM16 only, and the payload must actually fit in the buffer —
      // a lying data size must not read past the end.
      if (bits != 16 || dataOff < 0 || dataOff + dataSize > bytes.length)
        return corrupt(n, ck)
      var i = dataOff.toInt
      val end = (dataOff + (dataSize & ~1L)).toInt
      var nSamples = 0L
      var sumSq = 0L
      var nClipped = 0L
      var maxAbs = 0
      while (i + 2 <= end) {
        val s = bb.getShort(i).toInt
        val a = math.abs(s)
        nSamples += 1
        sumSq += s.toLong * s
        if (a >= clipAt) nClipped += 1
        if (a > maxAbs) maxAbs = a
        i += 2
      }
      ("wav", nSamples, sumSq, nClipped, maxAbs, n, ck)
    }
  }

  /** Perceptual audio fingerprint — the audio member of the
    * SimHash (text) / dHash (image) signature family: the PCM16
    * payload is split into 65 equal-occupancy segments (sample i →
    * segment i·65/n, integer division — trivially replayable), each
    * segment's ENERGY (exact integer sum of squares) is computed, and
    * each of the 64 bits records whether a segment is more energetic
    * than its predecessor (cross-multiplied with segment sizes — no
    * division, no float). Identical audio fingerprints identically;
    * small edits (an offset, mild re-gain) preserve most energy
    * ordering and move few bits, so the banded Hamming machinery
    * ([[graft.operators.Dedup.hammingNearDupsCollapsed]]) gives audio
    * near-dup detection. Non-PCM16, malformed RIFF, or payloads under
    * 65 samples degrade to the typed corrupt row. O(samples) per
    * blob, zero shuffle. */
  object AudioSigCodec extends Serializable {
    /** (format, 64-char '0'/'1' signature, or (corrupt, null)) */
    def signature(bytes: Array[Byte]): (String, String) = {
      def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return ("corrupt", null)
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12L
      var bits = -1
      var dataOff = -1L
      var dataSize = -1L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val id = ascii(o)
        val size = bb.getInt(o + 4).toLong & 0xffffffffL
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length)
          bits = bb.getShort(o + 22) & 0xffff
        else if (id == "data") { dataOff = off + 8; dataSize = size }
        off += 8 + size + (size & 1)
      }
      if (bits != 16 || dataOff < 0 || dataOff + dataSize > bytes.length)
        return ("corrupt", null)
      val n = (dataSize / 2).toInt
      if (n < 65) return ("corrupt", null)
      val e = new Array[Long](65)
      val c = new Array[Long](65)
      var i = 0
      while (i < n) {
        val s = bb.getShort((dataOff + 2L * i).toInt).toLong
        val j = (i.toLong * 65L / n).toInt
        e(j) += s * s
        c(j) += 1
        i += 1
      }
      val sb = new java.lang.StringBuilder(64)
      var j = 0
      while (j < 64) {
        sb.append(if (e(j + 1) * c(j) > e(j) * c(j + 1)) '1' else '0')
        j += 1
      }
      ("wav", sb.toString)
    }
  }

  /** Zero-crossing-rate kernel — the voiced/unvoiced/silence
    * discriminator of an audio-curation pass: walks the RIFF chunks to
    * the PCM16 payload, de-interleaves channels, and counts exact sign
    * changes between consecutive frames WITHIN each channel (a sign
    * change across interleaved channels is not a crossing — channel
    * layout matters and is spec-tested). High ZCR ≈ fricatives/noise,
    * near-zero ZCR with low amplitude ≈ silence; together with q119's
    * energy these are the standard cheap speech-corpus filters. Also
    * reports the exact Σ|sample| loudness proxy. Pure integer counts —
    * an oracle replays them from the generator's closed-form sample
    * formula without ever joining. Non-PCM16 / malformed RIFF degrade
    * to the typed corrupt row. O(samples) per blob, zero shuffle. */
  object ZcrStatsCodec extends Serializable {
    private val corruptRow = ("corrupt", -1, -1, -1L, -1L, -1L)
    /** (format, sample_rate, channels, n_frames, n_crossings, sum_abs);
      * corrupt → ("corrupt", -1, -1, -1, -1, -1). */
    def stats(bytes: Array[Byte]): (String, Int, Int, Long, Long, Long) = {
      def ascii(off: Int) = new String(bytes, off, 4, "US-ASCII")
      if (bytes.length < 12 || ascii(0) != "RIFF" || ascii(8) != "WAVE")
        return corruptRow
      val bb = java.nio.ByteBuffer.wrap(bytes)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      var off = 12L
      var bits = -1
      var channels = -1
      var rate = -1
      var dataOff = -1L
      var dataSize = -1L
      while (off + 8 <= bytes.length) {
        val o = off.toInt
        val id = ascii(o)
        val size = bb.getInt(o + 4).toLong & 0xffffffffL
        if (id == "fmt " && size >= 16 && off + 8 + 16 <= bytes.length) {
          channels = bb.getShort(o + 10) & 0xffff
          rate = bb.getInt(o + 12)
          bits = bb.getShort(o + 22) & 0xffff
        } else if (id == "data") { dataOff = off + 8; dataSize = size }
        off += 8 + size + (size & 1)
      }
      if (bits != 16 || channels <= 0 || rate <= 0 || dataOff < 0 ||
        dataOff + dataSize > bytes.length)
        return corruptRow
      val n = (dataSize / 2).toInt
      // last-seen sample per channel — the de-interleaved predecessor
      val prev = new Array[Int](channels)
      var crossings = 0L
      var sumAbs = 0L
      var i = 0
      while (i < n) {
        val s = bb.getShort((dataOff + 2L * i).toInt).toInt
        val c = i % channels
        if (i >= channels && ((s < 0) != (prev(c) < 0))) crossings += 1
        prev(c) = s
        sumAbs += math.abs(s)
        i += 1
      }
      ("wav", rate, channels, n.toLong / channels, crossings, sumAbs)
    }
  }

  /** Per-partition ZCR decode — [[decodePartitions]] with the
    * [[ZcrStatsCodec]] kernel: (id, format, sample_rate, channels,
    * n_frames, n_crossings, sum_abs). */
  def decodeAudioZcrPartitions(df: DataFrame, blobCol: String,
                               idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("sample_rate", IntegerType).add("channels", IntegerType)
      .add("n_frames", LongType).add("n_crossings", LongType)
      .add("sum_abs", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, sr, ch, nf, nc, sa) = ZcrStatsCodec.stats(bytes)
        Row(r.getLong(idIdx), f, sr, ch, nf, nc, sa)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition audio-fingerprint decode: (id, format, asig). */
  def decodeAudioSigPartitions(df: DataFrame, blobCol: String,
                               idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("asig", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, sig) = AudioSigCodec.signature(bytes)
        Row(r.getLong(idIdx), f, sig)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition PCM sample-statistics decode — [[decodePartitions]]
    * with the [[PcmStatsCodec]] kernel. */
  def decodeAudioStatsPartitions(df: DataFrame, blobCol: String,
                                 idCol: String,
                                 clipAt: Int = 32700): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("n_samples", LongType).add("sum_sq", LongType)
      .add("n_clipped", LongType).add("max_abs", IntegerType)
      .add("n_bytes", LongType).add("checksum", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, ns, sq, nc, ma, n, ck) = PcmStatsCodec.stats(bytes, clipAt)
        Row(r.getLong(idIdx), f, ns, sq, nc, ma, n, ck)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  // ------------------------------------------------------------- video

  /** Metadata struct for video blobs — the video twin of [[metaSchema]]:
    * presentation duration (ms, from mvhd timescale/duration), first
    * track dimensions (tkhd 16.16 fixed-point), track count. */
  val videoMetaSchema: StructType = new StructType()
    .add("format", StringType)
    .add("duration_ms", LongType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("n_tracks", IntegerType)
    .add("n_bytes", LongType)
    .add("checksum", StringType)

  /** Video decode-kernel seam — [[Codec]] contract: deterministic,
    * header-only, total. */
  trait VideoCodec extends Serializable {
    def probe(bytes: Array[Byte], formatHint: String)
        : (String, Long, Int, Int, Int, Long, String)
  }

  /** REAL MP4 (ISO-BMFF, the `ftyp`/`moov` container family) header
    * parser — pure JDK byte arithmetic like [[WavCodec]]: walks the
    * top-level box list, takes the major brand from `ftyp`, then inside
    * `moov` reads timescale + duration from `mvhd` (version 0 and 1
    * layouts) and counts `trak` boxes, pulling width/height from the
    * FIRST track's `tkhd` (16.16 fixed-point). No sample data is ever
    * touched — O(header), the metadata-pass shape. All box sizes are
    * handled as unsigned longs (size = 0 → to-end-of-file, size = 1 →
    * 64-bit largesize) so corrupt sizes end the walk instead of
    * wrapping; malformed input degrades to format = "corrupt". */
  object Mp4Codec extends VideoCodec {
    private def corrupt(n: Long, ck: String) =
      ("corrupt", -1L, -1, -1, -1, n, ck)
    def probe(bytes: Array[Byte], formatHint: String)
        : (String, Long, Int, Int, Int, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val ck = md.digest(bytes).map("%02x".format(_)).mkString
      val n = bytes.length.toLong
      val bb = java.nio.ByteBuffer.wrap(bytes) // ISO-BMFF is big-endian
      def ascii(off: Long) = new String(bytes, off.toInt, 4, "US-ASCII")
      def u32(off: Long): Long = bb.getInt(off.toInt).toLong & 0xffffffffL
      var brand: String = null
      var timescale = -1L
      var duration = -1L
      var nTracks = 0
      var width, height = -1
      // walk boxes in [from, to); visit(type, payloadFrom, payloadTo)
      def walk(from: Long, to: Long)(visit: (String, Long, Long) => Unit)
          : Unit = {
        var off = from
        while (off + 8 <= to) {
          val size0 = u32(off)
          val typ = ascii(off + 4)
          val (payload, size) =
            if (size0 == 0) (off + 8, to - off)           // to end
            else if (size0 == 1) {
              if (off + 16 > to) return
              (off + 16, bb.getLong(off.toInt + 8))       // largesize
            } else (off + 8, size0)
          if (size < 8 || off + size > to) return         // lying size
          visit(typ, payload, off + size)
          off += size
        }
      }
      walk(0, n) {
        case ("ftyp", p, _) if p + 4 <= n => brand = ascii(p)
        case ("moov", p, e) =>
          walk(p, e) {
            case ("mvhd", mp, me) if mp + 4 <= me =>
              val v = bytes(mp.toInt) & 0xff
              // v0: ts @+12, dur 32-bit @+16; v1: ts @+20, dur 64-bit @+24
              if (v == 0 && mp + 20 <= me) {
                timescale = u32(mp + 12); duration = u32(mp + 16)
              } else if (v == 1 && mp + 32 <= me) {
                timescale = u32(mp + 20); duration = bb.getLong(mp.toInt + 24)
              }
            case ("trak", tp, te) =>
              nTracks += 1
              walk(tp, te) {
                case ("tkhd", kp, ke) if width < 0 && kp + 4 <= ke =>
                  val v = bytes(kp.toInt) & 0xff
                  val wOff = if (v == 1) 88L else 76L // 16.16 fixed point
                  if (kp + wOff + 8 <= ke) {
                    width = (u32(kp + wOff) >> 16).toInt
                    height = (u32(kp + wOff + 4) >> 16).toInt
                  }
                case _ => ()
              }
            case _ => ()
          }
        case _ => ()
      }
      if (brand == null || timescale <= 0 || duration < 0) corrupt(n, ck)
      else (brand.trim.toLowerCase(java.util.Locale.ROOT),
        duration * 1000L / timescale, width, height, nTracks, n, ck)
    }
  }

  /** Deterministic minimal ISO-BMFF generator — the video sibling of
    * [[encodePng]]/[[encodeWav]]: a spec-shaped `ftyp` + `moov` with a
    * full 108-byte v0 `mvhd` and one standard 92-byte v0 `tkhd` per
    * track. Test/fixture generator, not a production operator. */
  def encodeMp4(timescale: Int, durationTicks: Long, width: Int,
                height: Int, nTracks: Int): Array[Byte] = {
    require(timescale > 0 && durationTicks >= 0 && nTracks >= 1,
      s"bad mp4 params $timescale/$durationTicks/$nTracks")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII"))
        .put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)  // v0 payload
      b.putInt(0)                                // version + flags
        .putInt(0).putInt(0)                     // creation, modification
        .putInt(timescale).putInt(durationTicks.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort) // rate 1.0, volume 1.0
      b.position(b.position() + 10)              // reserved
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
        .foreach(b.putInt)                       // identity matrix
      b.position(b.position() + 24)              // pre_defined
      b.putInt(nTracks + 1)                      // next_track_ID
      b.array()
    })
    val traks = (1 to nTracks).map { tid =>
      box("trak", box("tkhd", {
        val b = java.nio.ByteBuffer.allocate(84)          // v0 payload
        b.putInt(0x000007)                                // version+flags
          .putInt(0).putInt(0)                            // creation, mod
          .putInt(tid).putInt(0).putInt(durationTicks.toInt)
        b.position(b.position() + 8)                      // reserved
        b.putShort(0).putShort(0).putShort(0).putShort(0) // layer..reserved
        Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000)
          .foreach(b.putInt)                              // matrix
        b.putInt(width << 16).putInt(height << 16)        // 16.16 fixed
        b.array()
      }))
    }
    val moov = box("moov", mvhd ++ traks.flatten)
    ftyp ++ moov
  }

  /** REAL MP4 sample-table decode — past [[Mp4Codec]]'s header probe
    * and into `moov/trak/mdia/minf/stbl` (ISO 14496-12 §8.6–8.7), the
    * video member of the payload triad beside [[PcmStatsCodec]]
    * (audio samples) and [[DHashCodec]] (image pixels): the FIRST
    * track's `stts` (decoding time-to-sample: duration = Σ count·delta
    * in `mdhd` timescale ticks), `stsz` (sample sizes — uniform
    * `sample_size` or the per-sample table), and `stss` (sync-sample
    * table; ABSENT means every sample is sync per the spec) yield the
    * video discard signals: frame count, track duration, mean/max
    * frame size, keyframe count/ratio. Still O(container tables), the
    * media payload (`mdat`) is never touched. A lying container
    * (stts total ≠ stsz count, truncated tables, bad sizes) degrades
    * to format = "corrupt" — never an exception (fuzz-asserted). */
  object Mp4StatsCodec extends Serializable {
    private val Corrupt: (String, Long, Long, java.lang.Double, Long, Long,
        java.lang.Double) = ("corrupt", -1L, -1L, null, -1L, -1L, null)
    /** (format, n_frames, duration_ms, mean_frame_bytes,
      *  max_frame_bytes, n_keyframes, keyframe_ratio). */
    def stats(bytes: Array[Byte]): (String, Long, Long, java.lang.Double,
        Long, Long, java.lang.Double) = try {
      val n = bytes.length.toLong
      val bb = java.nio.ByteBuffer.wrap(bytes)
      def ascii(off: Long) = new String(bytes, off.toInt, 4, "US-ASCII")
      def u32(off: Long): Long = bb.getInt(off.toInt).toLong & 0xffffffffL
      var brand: String = null
      var mdhdTs = -1L
      var sttsTicks = -1L; var sttsN = -1L
      var szN = -1L; var szSum = -1L; var szMax = -1L
      var stssN = -1L                      // -1 = box absent (all sync)
      var firstTrak = true
      def walk(from: Long, to: Long)(visit: (String, Long, Long) => Unit)
          : Unit = {
        var off = from
        while (off + 8 <= to) {
          val size0 = u32(off)
          val typ = ascii(off + 4)
          val (payload, size) =
            if (size0 == 0) (off + 8, to - off)
            else if (size0 == 1) {
              if (off + 16 > to) return
              (off + 16, bb.getLong(off.toInt + 8))
            } else (off + 8, size0)
          if (size < 8 || off + size > to) return
          visit(typ, payload, off + size)
          off += size
        }
      }
      walk(0, n) {
        case ("ftyp", p, _) if p + 4 <= n => brand = ascii(p)
        case ("moov", p, e) => walk(p, e) {
          case ("trak", tp, te) if firstTrak =>
            firstTrak = false
            walk(tp, te) {
              case ("mdia", mp, me) => walk(mp, me) {
                case ("mdhd", dp, de) if dp + 4 <= de =>
                  val v = bytes(dp.toInt) & 0xff
                  if (v == 0 && dp + 16 <= de) mdhdTs = u32(dp + 12)
                  else if (v == 1 && dp + 24 <= de) mdhdTs = u32(dp + 20)
                case ("minf", np, ne) => walk(np, ne) {
                  case ("stbl", sp, se) => walk(sp, se) {
                    case ("stts", p1, e1) if p1 + 8 <= e1 =>
                      val entries = u32(p1 + 4)
                      if (p1 + 8 + entries * 8 <= e1) {
                        var i = 0L; var ticks = 0L; var cnt = 0L
                        while (i < entries) {
                          val c = u32(p1 + 8 + i * 8)
                          ticks += c * u32(p1 + 12 + i * 8); cnt += c
                          i += 1
                        }
                        sttsTicks = ticks; sttsN = cnt
                      }
                    case ("stsz", p1, e1) if p1 + 12 <= e1 =>
                      val uniform = u32(p1 + 4)
                      val cnt = u32(p1 + 8)
                      if (uniform > 0) {
                        szN = cnt; szSum = uniform * cnt; szMax = uniform
                      } else if (p1 + 12 + cnt * 4 <= e1 && cnt > 0) {
                        var i = 0L; var sum = 0L; var mx = -1L
                        while (i < cnt) {
                          val s = u32(p1 + 12 + i * 4)
                          sum += s; if (s > mx) mx = s
                          i += 1
                        }
                        szN = cnt; szSum = sum; szMax = mx
                      }
                    case ("stss", p1, e1) if p1 + 8 <= e1 =>
                      val entries = u32(p1 + 4)
                      if (p1 + 8 + entries * 4 <= e1) stssN = entries
                    case _ => ()
                  }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
          case _ => ()
        }
        case _ => ()
      }
      // a lying container is corrupt: the two sample censuses must agree
      if (brand == null || mdhdTs <= 0 || sttsN <= 0 || szN <= 0 ||
          sttsN != szN) Corrupt
      else {
        val nKey = if (stssN < 0) szN else stssN   // no stss → all sync
        (brand.trim.toLowerCase(java.util.Locale.ROOT), szN,
          sttsTicks * 1000L / mdhdTs,
          Double.box(szSum.toDouble / szN), szMax,
          nKey, Double.box(nKey.toDouble / szN))
      }
    } catch { case _: IndexOutOfBoundsException => Corrupt }
  }

  /** Frame-size-profile fingerprint over REAL ISO-BMFF sample tables —
    * the VIDEO member of the perceptual-signature family (image dHash
    * [[DHashCodec]], audio energy [[AudioSigCodec]]): the first
    * track's per-sample `stsz` sizes are bucketed into 65 segments
    * (sample i → segment i·65/n, the audio codec's exact rule),
    * per-segment size SUMS are compared cross-multiplied with segment
    * counts (no division, no float), and each of the 64 bits records
    * whether a segment outweighs its predecessor. Identical streams
    * fingerprint identically regardless of container bytes; a lightly
    * re-encoded copy preserves most of the size profile and lands a
    * few Hamming bits away — so the banded machinery
    * ([[graft.operators.Dedup.hammingNearDupsCollapsed]]) extends
    * near-dup detection to video. Uniform-stsz streams, fewer than 65
    * samples, or malformed boxes degrade to the typed corrupt row.
    * O(sample table) per blob, `mdat` never read, zero shuffle. */
  object VideoSigCodec extends Serializable {
    /** (format, 64-char '0'/'1' signature, or (corrupt, null)) */
    def signature(bytes: Array[Byte]): (String, String) = try {
      val n = bytes.length.toLong
      val bb = java.nio.ByteBuffer.wrap(bytes)
      def ascii(off: Long) = new String(bytes, off.toInt, 4, "US-ASCII")
      def u32(off: Long): Long = bb.getInt(off.toInt).toLong & 0xffffffffL
      var brand: String = null
      var sizesOff = -1L
      var sampleCount = -1L
      var firstTrak = true
      def walk(from: Long, to: Long)(visit: (String, Long, Long) => Unit)
          : Unit = {
        var off = from
        while (off + 8 <= to) {
          val size0 = u32(off)
          val typ = ascii(off + 4)
          val (payload, size) =
            if (size0 == 0) (off + 8, to - off)
            else if (size0 == 1) {
              if (off + 16 > to) return
              (off + 16, bb.getLong(off.toInt + 8))
            } else (off + 8, size0)
          if (size < 8 || off + size > to) return
          visit(typ, payload, off + size)
          off += size
        }
      }
      walk(0, n) {
        case ("ftyp", p, _) if p + 4 <= n => brand = ascii(p)
        case ("moov", p, e) => walk(p, e) {
          case ("trak", tp, te) if firstTrak =>
            firstTrak = false
            walk(tp, te) { case ("mdia", mp, me) => walk(mp, me) {
              case ("minf", np, ne) => walk(np, ne) {
                case ("stbl", sp, se) => walk(sp, se) {
                  case ("stsz", p1, e1) if p1 + 12 <= e1 =>
                    val uniform = u32(p1 + 4)
                    val cnt = u32(p1 + 8)
                    // per-sample layout only: a uniform stream has a
                    // flat (information-free) profile — corrupt here
                    if (uniform == 0 && p1 + 12 + cnt * 4 <= e1) {
                      sizesOff = p1 + 12; sampleCount = cnt
                    }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
            case _ => () }
          case _ => ()
        }
        case _ => ()
      }
      if (brand == null || sampleCount < 65) ("corrupt", null)
      else {
        val e = new Array[Long](65)
        val c = new Array[Long](65)
        var i = 0L
        while (i < sampleCount) {
          val j = (i * 65L / sampleCount).toInt
          e(j) += u32(sizesOff + i * 4)
          c(j) += 1
          i += 1
        }
        val sb = new java.lang.StringBuilder(64)
        var j = 0
        while (j < 64) {
          sb.append(if (e(j + 1) * c(j) > e(j) * c(j + 1)) '1' else '0')
          j += 1
        }
        (brand.trim.toLowerCase(java.util.Locale.ROOT), sb.toString)
      }
    } catch { case _: IndexOutOfBoundsException => ("corrupt", null) }
  }

  /** Per-partition video-fingerprint decode: (id, format, vsig). */
  def decodeVideoSigPartitions(df: DataFrame, blobCol: String,
                               idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("vsig", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, sig) = VideoSigCodec.signature(bytes)
        Row(r.getLong(idIdx), f, sig)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Deterministic ISO-BMFF generator WITH sample tables — extends the
    * [[encodeMp4]] shape with a full `mdia/mdhd` + `minf/stbl` carrying
    * spec-shaped `stts` (two runs: ⌊n/2⌋ frames at `delta1` ticks then
    * the rest at `delta2`), `stsz` (`uniformSize` > 0 → uniform-size
    * layout, else a per-sample table with size_i = 500 + (seed·31 +
    * i·97) mod 1000), and `stss` (sync samples 1, 1+keyEvery, …).
    * Test/fixture generator, not a production operator. */
  def encodeMp4Sampled(width: Int, height: Int, nFrames: Int, keyEvery: Int,
                       trackTimescale: Int, delta1: Int, delta2: Int,
                       uniformSize: Int, seed: Long): Array[Byte] = {
    require(nFrames >= 2 && keyEvery >= 1 && trackTimescale > 0 &&
      delta1 > 0 && delta2 > 0 && uniformSize >= 0,
      s"bad sampled-mp4 params $nFrames/$keyEvery/$trackTimescale")
    def box(typ: String, payload: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(8 + payload.length)
      bb.putInt(8 + payload.length).put(typ.getBytes("US-ASCII")).put(payload)
      bb.array()
    }
    val ftyp = box("ftyp", {
      val b = java.nio.ByteBuffer.allocate(16)
      b.put("isom".getBytes("US-ASCII")).putInt(0)
        .put("isom".getBytes("US-ASCII")).put("mp41".getBytes("US-ASCII"))
      b.array()
    })
    val n1 = nFrames / 2
    val n2 = nFrames - n1
    val durTicks = n1.toLong * delta1 + n2.toLong * delta2
    val mvhd = box("mvhd", {
      val b = java.nio.ByteBuffer.allocate(100)
      b.putInt(0).putInt(0).putInt(0)
        .putInt(trackTimescale).putInt(durTicks.toInt)
        .putInt(0x00010000).putShort(0x0100.toShort)
      b.position(b.position() + 10)
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.position(b.position() + 24)
      b.putInt(2)
      b.array()
    })
    val tkhd = box("tkhd", {
      val b = java.nio.ByteBuffer.allocate(84)
      b.putInt(0x000007).putInt(0).putInt(0)
        .putInt(1).putInt(0).putInt(durTicks.toInt)
      b.position(b.position() + 8)
      b.putShort(0).putShort(0).putShort(0).putShort(0)
      Array(0x10000, 0, 0, 0, 0x10000, 0, 0, 0, 0x40000000).foreach(b.putInt)
      b.putInt(width << 16).putInt(height << 16)
      b.array()
    })
    val mdhd = box("mdhd", {
      val b = java.nio.ByteBuffer.allocate(20)   // v0 payload
      b.putInt(0).putInt(0).putInt(0)
        .putInt(trackTimescale).putInt(durTicks.toInt)
      b.array()
    })
    val stts = box("stts", {
      val b = java.nio.ByteBuffer.allocate(8 + 16)
      b.putInt(0).putInt(2)
        .putInt(n1).putInt(delta1).putInt(n2).putInt(delta2)
      b.array()
    })
    val stsz = box("stsz",
      if (uniformSize > 0) {
        val b = java.nio.ByteBuffer.allocate(12)
        b.putInt(0).putInt(uniformSize).putInt(nFrames)
        b.array()
      } else {
        val b = java.nio.ByteBuffer.allocate(12 + 4 * nFrames)
        b.putInt(0).putInt(0).putInt(nFrames)
        var i = 0
        while (i < nFrames) {
          b.putInt((500L + (seed * 31L + i * 97L) % 1000L).toInt); i += 1
        }
        b.array()
      })
    val keyNums = 1 to nFrames by keyEvery
    val stss = box("stss", {
      val b = java.nio.ByteBuffer.allocate(8 + 4 * keyNums.size)
      b.putInt(0).putInt(keyNums.size)
      keyNums.foreach(b.putInt)
      b.array()
    })
    val stbl = box("stbl", stts ++ stsz ++ stss)
    val mdia = box("mdia", mdhd ++ box("minf", stbl))
    ftyp ++ box("moov", mvhd ++ box("trak", tkhd ++ mdia))
  }

  /** Per-partition MP4 sample-table decode — the [[Mp4StatsCodec]] row
    * shape: (id, format, n_frames, duration_ms, mean_frame_bytes,
    * max_frame_bytes, n_keyframes, keyframe_ratio). Zero shuffle,
    * linear per blob. */
  def decodeVideoStatsPartitions(df: DataFrame, blobCol: String,
                                 idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("n_frames", LongType).add("duration_ms", LongType)
      .add("mean_frame_bytes", DoubleType).add("max_frame_bytes", LongType)
      .add("n_keyframes", LongType).add("keyframe_ratio", DoubleType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, nf, d, mean, mx, nk, kr) = Mp4StatsCodec.stats(bytes)
        Row(r.getLong(idIdx), f, nf, d, mean, mx, nk, kr)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Per-partition video decode — [[decodePartitions]] with the
    * [[videoMetaSchema]] row shape and a [[VideoCodec]] kernel. */
  def decodeVideoPartitions(df: DataFrame, blobCol: String, idCol: String,
                            format: String, codec: VideoCodec): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("format", StringType)
      .add("duration_ms", LongType).add("width", IntegerType)
      .add("height", IntegerType).add("n_tracks", IntegerType)
      .add("n_bytes", LongType).add("checksum", StringType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.map { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, d, w, h, t, nb, ck) = codec.probe(bytes, format)
        Row(r.getLong(idIdx), f, d, w, h, t, nb, ck)
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Generic ISO-BMFF box walk over `[from, to)` — the traversal shared
    * by the sample-table kernels. Lying sizes terminate the walk. */
  private def boxWalk(bytes: Array[Byte], from: Long, to: Long)(
      visit: (String, Long, Long) => Unit): Unit = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    var off = from
    while (off + 8 <= to) {
      val size0 = bb.getInt(off.toInt).toLong & 0xffffffffL
      val typ = new String(bytes, off.toInt + 4, 4, "US-ASCII")
      val (payload, size) =
        if (size0 == 0) (off + 8, to - off)
        else if (size0 == 1) {
          if (off + 16 > to) return
          (off + 16, bb.getLong(off.toInt + 8))
        } else (off + 8, size0)
      if (size < 8 || off + size > to) return
      visit(typ, payload, off + size)
      off += size
    }
  }

  /** Sync-sample (keyframe) extraction from REAL sample tables — the
    * frames a production sampler actually decodes (only keyframes
    * decode without reference chains, so thumbnail/contact-sheet/
    * frame-embedding passes align on `stss`): the first track's sync
    * sample numbers plus the stsz frame count. Absent `stss` means
    * every sample is sync (ISO 14496-12), emitted only when the frame
    * count is sane (≤ 2²⁰ — a lying uniform-stsz count must not
    * allocate gigabytes). Malformed input → ("corrupt", -1, empty),
    * never a throw (fuzz law). */
  object KeyframeCodec extends Serializable {
    private val Corrupt: (String, Long, Array[Long]) =
      ("corrupt", -1L, Array.empty[Long])
    def keyframes(bytes: Array[Byte]): (String, Long, Array[Long]) = try {
      val n = bytes.length.toLong
      val bb = java.nio.ByteBuffer.wrap(bytes)
      def u32(off: Long): Long = bb.getInt(off.toInt).toLong & 0xffffffffL
      var brand: String = null
      var szN = -1L
      var sync: Array[Long] = null
      var firstTrak = true
      boxWalk(bytes, 0, n) {
        case ("ftyp", p, _) if p + 4 <= n =>
          brand = new String(bytes, p.toInt, 4, "US-ASCII")
        case ("moov", p, e) => boxWalk(bytes, p, e) {
          case ("trak", tp, te) if firstTrak =>
            firstTrak = false
            boxWalk(bytes, tp, te) { case ("mdia", mp, me) =>
              boxWalk(bytes, mp, me) { case ("minf", np, ne) =>
                boxWalk(bytes, np, ne) { case ("stbl", sp, se) =>
                  boxWalk(bytes, sp, se) {
                    case ("stsz", p1, e1) if p1 + 12 <= e1 =>
                      val uniform = u32(p1 + 4)
                      val cnt = u32(p1 + 8)
                      if (uniform > 0 || p1 + 12 + cnt * 4 <= e1) szN = cnt
                    case ("stss", p1, e1) if p1 + 8 <= e1 =>
                      val entries = u32(p1 + 4)
                      if (p1 + 8 + entries * 4 <= e1 &&
                          entries <= (1L << 20)) {
                        sync = Array.tabulate(entries.toInt)(i =>
                          u32(p1 + 8 + i.toLong * 4))
                      }
                    case _ => ()
                  }
                  case _ => ()
                }
                case _ => ()
              }
              case _ => ()
            }
          case _ => ()
        }
        case _ => ()
      }
      if (brand == null || szN <= 0) Corrupt
      else if (sync != null)
        (brand.trim.toLowerCase(java.util.Locale.ROOT), szN, sync)
      else if (szN <= (1L << 20))   // no stss → every sample is sync
        (brand.trim.toLowerCase(java.util.Locale.ROOT), szN,
          Array.tabulate(szN.toInt)(i => i + 1L))
      else Corrupt
    } catch { case _: IndexOutOfBoundsException => Corrupt }
  }

  /** Keyframe-aligned frame sampling over REAL sample tables — the
    * production upgrade of [[sampleFrames]]'s pseudo-count plumbing:
    * one row per `stss` sync sample, (id, n_frames, sample_number
    * 1-based per the spec). Corrupt blobs emit no rows (quarantine is
    * the monitor's job). Zero shuffle, O(sample table) per blob. */
  def sampleKeyframes(df: DataFrame, blobCol: String,
                      idCol: String): DataFrame = {
    val spark = df.sparkSession
    val outSchema = new StructType()
      .add("id", LongType).add("n_frames", LongType)
      .add("sample_number", LongType)
    val idIdx = df.schema.fieldIndex(idCol)
    val blobIdx = df.schema.fieldIndex(blobCol)
    val rdd = df.rdd.mapPartitions { it =>
      it.flatMap { r =>
        val bytes = r.getAs[Array[Byte]](blobIdx)
        val (f, nf, sync) = KeyframeCodec.keyframes(bytes)
        if (f == "corrupt") Iterator.empty
        else sync.iterator.map(sn => Row(r.getLong(idIdx), nf, sn))
      }
    }
    spark.createDataFrame(rdd, outSchema)
  }

  /** Frame sampling plumbing: emit every `stride`-th "frame index" up to
    * a deterministic pseudo frame count derived from the blob. With a
    * real video codec the frame count comes from the container header and
    * each emitted row carries the decoded frame bytes. */
  def sampleFrames(df: DataFrame, blobCol: String, idCol: String,
                   stride: Int): DataFrame = {
    val nFrames = (length(col(blobCol)) % 32 + 1).cast("int")
    df.select(col(idCol).as("id"), nFrames.as("n_frames"))
      .select(col("id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(stride))).as("frame_idx"))
  }
}
