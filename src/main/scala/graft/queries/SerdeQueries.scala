package graft.queries

import graft.Tables
import graft.sources.JsonSerde
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Serde identity on driver data: every event is serialized through the
  * engine's Kafka-sink path (`to_json(struct(*))`) and parsed back
  * through the source path (`from_json`, FAILFAST). The oracle is simply
  * the original rows — any loss, reordering, or precision drift in the
  * JSON round-trip breaks the hash match. This is the reference's whole
  * data model (JSON.parse/stringify, SURVEY.md §1) certified on 10k+
  * real rows rather than a unit example.
  */
object SerdeQueries {

  val q47 = GQuery("q47_serde_roundtrip",
    """SELECT event_id, user_id, event_type,
      |  value AS val,
      |  CAST(floor(epoch(ts)) AS BIGINT) AS ts_sec,
      |  CAST(json_extract_string(props, '$.k') AS INT) AS k
      |FROM events ORDER BY event_id""".stripMargin) { (s, dir) =>
    val payload = Tables.events(s, dir)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value").as("val"),
        unix_timestamp(col("ts")).as("ts_sec"),
        get_json_object(col("props"), "$.k").cast("int").as("k"))
    val schema = payload.schema.asInstanceOf[StructType]
    val wire = JsonSerde.encode(payload)                   // sink path
    JsonSerde.decode(wire, schema, JsonSerde.FailFast)     // source path
      .select(col("value.*"))
      .orderBy(col("event_id"))
  }

  /** Fixed-size overlapping word chunks (size 20, overlap 5) over
    * documents — the training-data chunking staple. */
  val q48 = GQuery("q48_chunking",
    """WITH t AS (
      |  SELECT doc_id, list_filter(string_split(text, ' '), x -> x <> '') AS ws
      |  FROM documents),
      |c AS (
      |  SELECT doc_id, ws, unnest(range(0, len(ws), 15)) AS start
      |  FROM t WHERE len(ws) > 0)
      |SELECT doc_id,
      |  CAST(start / 15 AS INT) AS chunk_id,
      |  array_to_string(ws[start + 1 : start + 20], ' ') AS chunk,
      |  CAST(least(20, len(ws) - start) AS INT) AS n_words
      |FROM c
      |WHERE start = 0 OR len(ws) - start > 5
      |ORDER BY doc_id, chunk_id""".stripMargin) { (s, dir) =>
    graft.operators.Chunking.chunkWords(
        Tables.documents(s, dir), "doc_id", "text", size = 20, overlap = 5)
      .select(col("id").as("doc_id"), col("chunk_id"), col("chunk"), col("n_words"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  val all: Seq[GQuery] = Seq(q47, q48)
}
