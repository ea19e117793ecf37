package graft.queries

import graft.Tables
import graft.operators.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing demonstrated on real driver data: document
  * text re-encoded as binary blobs (the container has no media libs —
  * the decode step is the deterministic FakeCodec; the schema/partition/
  * batch plumbing is the real thing).
  */
object MultimodalQueries {

  private val hexv: String => String = c => s"(strpos('0123456789abcdef', $c) - 1)"
  /** SQL for the integer value of md5 hex chars [i, i+1] (1-based). */
  private def hexPair(h: String, i: Int): String =
    s"(${hexv(s"substr($h, $i, 1)")} * 16 + ${hexv(s"substr($h, ${i + 1}, 1)")})"

  /** Blob metadata extraction: byte length, checksum, pseudo-dimensions
    * derived from the checksum (the FakeCodec contract). */
  val q34 = GQuery("q34_multimodal_meta",
    s"""WITH b AS (SELECT doc_id, md5(text) AS ck, octet_length(encode(text)) AS nb
       |           FROM documents)
       |SELECT doc_id,
       |  'txt' AS format,
       |  CAST(64 + (${hexPair("ck", 1)} % 16) * 64 AS INT) AS width,
       |  CAST(64 + (${hexPair("ck", 3)} % 16) * 64 AS INT) AS height,
       |  CAST(nb AS BIGINT) AS n_bytes,
       |  ck AS checksum
       |FROM b ORDER BY doc_id""".stripMargin) { (s, dir) =>
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
    Multimodal.withMeta(blobs, "blob", "txt")
      .select(col("doc_id"), col("meta.format").as("format"),
        col("meta.width").as("width"), col("meta.height").as("height"),
        col("meta.n_bytes").as("n_bytes"), col("meta.checksum").as("checksum"))
      .orderBy(col("doc_id"))
  }

  /** Frame-sampling plumbing: deterministic pseudo frame counts, every
    * 2nd frame index emitted via explode/unnest. */
  val q35 = GQuery("q35_frame_sample",
    """WITH b AS (SELECT doc_id AS id,
      |  CAST(octet_length(encode(text)) % 32 + 1 AS INT) AS n_frames FROM documents)
      |SELECT id, n_frames, CAST(unnest(range(0, n_frames, 2)) AS INT) AS frame_idx
      |FROM b ORDER BY id, frame_idx""".stripMargin) { (s, dir) =>
    val blobs = Tables.documents(s, dir)
      .select(col("doc_id"), encode(col("text"), "utf-8").as("blob"))
    Multimodal.sampleFrames(blobs, "blob", "doc_id", stride = 2)
      .select(col("id"), col("n_frames"), col("frame_idx").cast("int").as("frame_idx"))
      .orderBy(col("id"), col("frame_idx"))
  }

  val all: Seq[GQuery] = Seq(q34, q35)
}
