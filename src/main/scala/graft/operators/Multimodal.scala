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
  def encodePng(w: Int, h: Int, seed: Long): Array[Byte] = {
    require(w >= 1 && h >= 1, s"bad dimensions ${w}x$h")
    val img = new java.awt.image.BufferedImage(
      w, h, java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        img.setRGB(x, y, ((seed + x * 31L + y * 131L) & 0xffffff).toInt)
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
