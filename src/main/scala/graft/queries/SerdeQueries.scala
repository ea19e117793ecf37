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

  val all: Seq[GQuery] = Seq(q47)
}
