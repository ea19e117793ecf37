package graft.sources

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.streaming.{DataStreamWriter, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Kafka source/sink/duplex — the reference's three entry points
  * (src/index.coffee:13-17) re-expressed on Structured Streaming.
  *
  * Partition-parallelism note: the reference drains ALL Kafka partitions
  * through one sequential JS loop (src/Consumer.coffee:71-110); here each
  * Kafka partition maps to a Spark task, so source parallelism scales
  * with the topic, and backpressure is the micro-batch trigger +
  * `maxOffsetsPerTrigger` instead of `push()` return values.
  */
object KafkaSource {

  /** Streaming scan (reference `new Consumer(...)`, src/Consumer.coffee:9-55). */
  def stream(spark: SparkSession, cfg: ConsumerConfig): DataFrame =
    spark.readStream.format("kafka").options(cfg.readerOptions).load()

  /** Bounded scan of the same topic(s) — batch analytics over a topic,
    * which the reference cannot do at all. */
  def batch(spark: SparkSession, cfg: ConsumerConfig): DataFrame =
    spark.read.format("kafka").options(cfg.readerOptions).load()

  /** Source + envelope decode in one step. */
  def streamDecoded(spark: SparkSession, cfg: ConsumerConfig,
                    schema: StructType,
                    mode: JsonSerde.Mode = JsonSerde.Permissive): DataFrame =
    JsonSerde.decode(stream(spark, cfg), schema, mode)
}

object KafkaSink {

  /** Sink writer (reference `ps.write(obj)`, src/Producer.coffee:63-87).
    * `checkpoint` gives at-least-once delivery — the reference's
    * auto-commit guarantee (SURVEY.md §2.1 #14) — with recovery the
    * reference lacks. Caller `.start()`s (analog of connect) and
    * `.stop()`s (analog of destroy, src/Producer.coffee:89-118). */
  def writer(df: DataFrame, cfg: ProducerConfig, checkpoint: String,
             keyCol: Option[String] = None,
             partitionCol: Option[String] = None,
             trigger: Trigger = Trigger.ProcessingTime(0)): DataStreamWriter[Row] =
    JsonSerde.encode(df, keyCol, partitionCol)
      .writeStream
      .format("kafka")
      .options(cfg.writerOptions)
      .option("checkpointLocation", checkpoint)
      .trigger(trigger)
}

/** The reference's `getDuplex` (src/index.coffee:7-11): consumer and
  * producer fused over one config so a topic can be read, transformed,
  * and written back — `ds.pipe(transform).pipe(ds)` becomes one
  * streaming query.
  */
object Duplex {

  final case class DuplexConfig(
      consumer: ConsumerConfig,
      producer: ProducerConfig,
      schema: StructType,
      mode: JsonSerde.Mode = JsonSerde.Permissive)

  object DuplexConfig {
    /** One option set builds both halves, like `getDuplex(options)`. */
    def fromOptions(options: Map[String, Any], schema: StructType): DuplexConfig =
      DuplexConfig(
        ConsumerConfig.fromOptions(options),
        ProducerConfig.fromOptions(options),
        schema)
  }

  /** The loopback topology: read topic → decode → user transform on the
    * payload frame → encode → write back. Returns the un-started writer
    * so tests/callers control lifecycle. */
  def topology(spark: SparkSession, cfg: DuplexConfig, checkpoint: String)(
      transform: DataFrame => DataFrame): DataStreamWriter[Row] = {
    val decoded = KafkaSource.streamDecoded(spark, cfg.consumer, cfg.schema, cfg.mode)
    val transformed = transform(decoded.select("value.*"))
    KafkaSink.writer(transformed, cfg.producer, checkpoint)
  }

  /** The payload-level transform pipeline alone (source/sink-agnostic) —
    * exactly what the reference demonstrates as userland Transform stages
    * (README.md:41-64): parse raw JSON strings, apply the transform,
    * serialize back. Used by the MemoryStream parity tests. */
  def transformPipeline(raw: DataFrame, schema: StructType,
                        serdeMode: JsonSerde.Mode)(
      userTransform: DataFrame => DataFrame): DataFrame = {
    val decoded = JsonSerde.decode(
      raw.select(org.apache.spark.sql.functions.col("value")), schema, serdeMode)
    JsonSerde.encode(userTransform(decoded.select("value.*")))
  }
}

/** Delivery metrics, the analog of the reference's `dr`/`total-delivered`
  * events (src/Producer.coffee:42-61, minus its run-once poll-loop bug):
  * a StreamingQueryListener accumulating rows in/out per query.
  */
final class DeliveryMetrics extends org.apache.spark.sql.streaming.StreamingQueryListener {
  import org.apache.spark.sql.streaming.StreamingQueryListener._
  import java.util.concurrent.atomic.LongAdder

  private val in = new LongAdder
  private val out = new LongAdder
  @volatile private var batches = 0L

  def totalIn: Long = in.sum()
  /** Total rows delivered to the sink (`total-delivered`). */
  def totalDelivered: Long = out.sum()
  def numBatches: Long = batches

  override def onQueryStarted(e: QueryStartedEvent): Unit = ()
  override def onQueryProgress(e: QueryProgressEvent): Unit = {
    in.add(e.progress.numInputRows)
    out.add(Option(e.progress.sink.numOutputRows).filter(_ >= 0).getOrElse(0L))
    batches += 1
  }
  override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
}

/** Lifecycle helper — the analog of the reference's idempotent
  * `destroy(err, cb)` with its 6 s disconnect timeout
  * (src/Consumer.coffee:112-151). */
object Lifecycle {
  /** Stop a query, waiting up to `timeoutMs` like the reference's
    * disconnect timeout; idempotent on already-stopped queries. */
  def destroy(query: StreamingQuery, timeoutMs: Long = 6000L): Boolean = {
    if (query.isActive) query.stop()
    query.awaitTermination(timeoutMs)
  }
}
