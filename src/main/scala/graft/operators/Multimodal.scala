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
  * The decode kernels themselves are STUBBED deterministically — the
  * image/audio libraries are not in this container — but the Spark-side
  * plumbing (schemas, partitioning, batch shape, per-partition iteration)
  * is real and tested; swap [[FakeCodec]] for a real codec binding to go
  * to production.
  */
object Multimodal {

  /** Metadata struct carried with every media blob. */
  val metaSchema: StructType = new StructType()
    .add("format", StringType)
    .add("width", IntegerType)
    .add("height", IntegerType)
    .add("n_bytes", LongType)
    .add("checksum", StringType)

  /** Deterministic stand-in for a real decoder: derives pseudo
    * width/height from the content hash, real byte length + md5 checksum
    * from the bytes. Replace with a JNI/ffmpeg/ImageIO binding in
    * production — signature stays identical. */
  object FakeCodec {
    def probe(bytes: Array[Byte], format: String): (String, Int, Int, Long, String) = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val digest = md.digest(bytes).map("%02x".format(_)).mkString
      // pseudo-dimensions from the first hash bytes — deterministic
      val w = 64 + (Integer.parseInt(digest.substring(0, 2), 16) % 16) * 64
      val h = 64 + (Integer.parseInt(digest.substring(2, 4), 16) % 16) * 64
      (format, w, h, bytes.length.toLong, digest)
    }
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

  /** Per-partition decode pipeline — the shape a REAL codec needs
    * (iterate a partition, decode each blob, emit rows). Demonstrated
    * with [[FakeCodec]]; bounded memory per task regardless of partition
    * size because the iterator is streamed. */
  def decodePartitions(df: DataFrame, blobCol: String, idCol: String,
                       format: String): DataFrame = {
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
        val (f, w, h, n, ck) = FakeCodec.probe(bytes, format)
        Row(r.getLong(idIdx), f, w, h, n, ck)
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
