package graft.sources

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** JSON (de)serialization + message envelope, the reference's whole data
  * model (SURVEY.md §1).
  *
  * Decode reproduces `JSON.parse(message.value.toString())` +
  * `_.extend {}, message, {value}` (src/Consumer.coffee:85-96): the Kafka
  * envelope columns are kept and `value` is replaced by the parsed struct.
  *
  * Encode reproduces `Buffer.from JSON.stringify message`
  * (src/Producer.coffee:77): the whole row serializes into `value` —
  * with proper optional key/partition columns (fixing reference bugs
  * §2.1 #12).
  */
object JsonSerde {

  sealed trait Mode { def sparkMode: String }
  /** Reference semantics: one malformed record kills the pipeline
    * (src/Consumer.coffee:84-94,106-107). */
  case object FailFast extends Mode { val sparkMode = "FAILFAST" }
  /** Engine default at scale: malformed payloads land in a dead-letter
    * column instead of failing 100 TB of work for one bad record. */
  case object Permissive extends Mode { val sparkMode = "PERMISSIVE" }

  val CorruptCol = "_corrupt_record"

  /** Envelope columns emitted by Spark's Kafka source (near 1:1 with the
    * librdkafka message, SURVEY.md §1.4). */
  val envelopeCols: Seq[String] =
    Seq("topic", "partition", "offset", "key", "timestamp")

  /** Parse a raw Kafka frame (binary `value`) into the envelope + typed
    * payload struct. */
  def decode(raw: DataFrame, schema: StructType, mode: Mode = Permissive): DataFrame = {
    val withCorrupt = mode match {
      case Permissive => schema.add(CorruptCol, "string")
      case FailFast => schema
    }
    val opts = Map("mode" -> mode.sparkMode, "columnNameOfCorruptRecord" -> CorruptCol)
    val present = raw.columns.filter(envelopeCols.contains).map(col).toSeq
    raw.select(present :+
      from_json(col("value").cast("string"), withCorrupt, opts).as("value"): _*)
  }

  /** Infer the payload schema from a sample of raw frames — the on-ramp
    * for schemaless topics (the reference's normal user never declares a
    * schema; README.md:31-34 just JSON.parses whatever arrives).
    *
    * Runs Spark's distributed JSON schema inference over up to
    * `sampleRows` values — one extra batch pass over the sample, done
    * once up front, never per-record. For a streaming topic, point this
    * at a bounded batch read of the same topic
    * (`spark.read.format("kafka")... limit(n)`), then decode the stream
    * with the inferred schema; pair with [[Permissive]] decode so later
    * drift lands in the dead-letter column instead of failing the job. */
  def inferSchema(raw: DataFrame, sampleRows: Int = 1000): StructType = {
    val spark = raw.sparkSession
    import spark.implicits._
    val sample = raw.select(col("value").cast("string").as("v"))
      .where(col("v").isNotNull).limit(sampleRows).as[String]
    spark.read.json(sample).schema
  }

  /** [[decode]] with the schema inferred from the frame sample itself. */
  def decodeInferred(raw: DataFrame, mode: Mode = Permissive,
                     sampleRows: Int = 1000): DataFrame =
    decode(raw, inferSchema(raw, sampleRows), mode)

  /** Split a [[Permissive]]-decoded frame into (good, dead-letter):
    * good rows carry the typed payload with the corrupt column removed;
    * dead-letter rows keep the envelope plus the RAW malformed text for
    * replay/repair. The production topology: good → the pipeline,
    * dead-letter → a DLQ sink — one bad producer never fails 100 TB of
    * work, and nothing is silently dropped (the reference fail-stops
    * instead, src/Consumer.coffee:106-107). Works identically on batch
    * and streaming frames (both sides of the split are plain filters). */
  def splitDlq(decoded: DataFrame): (DataFrame, DataFrame) = {
    val corrupt = col(s"value.$CorruptCol")
    val present = decoded.columns.filter(envelopeCols.contains).map(col).toSeq
    val good = decoded.where(corrupt.isNull)
      .withColumn("value", col("value").dropFields(CorruptCol))
    val bad = decoded.where(corrupt.isNotNull)
      .select(present :+ corrupt.as("raw"): _*)
    (good, bad)
  }

  /** Serialize payload columns to a JSON `value` column; key/partition
    * columns (if named) ride along for the Kafka sink. */
  def encode(df: DataFrame, keyCol: Option[String] = None,
             partitionCol: Option[String] = None): DataFrame = {
    val payloadCols = df.columns
      .filterNot(c => keyCol.contains(c) || partitionCol.contains(c))
      .map(col).toSeq
    val out = Seq(to_json(struct(payloadCols: _*)).as("value")) ++
      keyCol.map(c => col(c).cast("string").as("key")) ++
      partitionCol.map(c => col(c).cast("int").as("partition"))
    df.select(out: _*)
  }
}
