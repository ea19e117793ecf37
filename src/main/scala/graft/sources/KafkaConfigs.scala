package graft.sources

/** Kafka source/sink configuration with the reference's option
  * validation semantics: a missing required option throws
  * ``No `attr` in options`` (reference: src/Consumer.coffee:18-19,
  * src/Producer.coffee:15-16 — message text preserved).
  */
object Options {
  def require(options: Map[String, Any], attr: String): Unit =
    if (!options.contains(attr) || options(attr) == null)
      throw new IllegalArgumentException(s"No `$attr` in options")
}

/** Consumer-side config (reference: src/Consumer.coffee:10-27).
  *
  * @param host          bootstrap servers (reference `host`)
  * @param topics        ≥1 topics; the reference accepts string-or-array
  *                      (src/Consumer.coffee:45 `asArray`) — here always a Seq
  * @param groupId       consumer group
  * @param fromOffset    offset-reset policy: "earliest"/"latest"
  *                      (reference `fromOffset` → `auto.offset.reset`,
  *                      src/Consumer.coffee:26)
  * @param maxPerTrigger rate bound per micro-batch — the engine analog of
  *                      the reference's 16-message fetch window
  *                      (src/Consumer.coffee:57) and pull-loop backpressure
  * @param extra         passthrough `kafka.*` options
  * @param topicPattern  regex subscription (Spark `subscribePattern`) —
  *                      mutually exclusive with `topics`
  */
final case class ConsumerConfig(
    host: String,
    topics: Seq[String],
    groupId: String,
    fromOffset: Option[String] = None,
    maxPerTrigger: Option[Long] = None,
    extra: Map[String, String] = Map.empty,
    topicPattern: Option[String] = None) {
  require(topics.nonEmpty || topicPattern.isDefined, "No `topic` in options")
  require(topics.isEmpty || topicPattern.isEmpty,
    "`topic` and `topicPattern` are mutually exclusive")

  /** Options for `spark.readStream.format("kafka")`. */
  def readerOptions: Map[String, String] =
    Map(
      "kafka.bootstrap.servers" -> host,
      "kafka.group.id" -> groupId) ++
      (topicPattern match {
        case Some(p) => Map("subscribePattern" -> p)
        case None => Map("subscribe" -> topics.mkString(","))
      }) ++
      fromOffset.map(o => "startingOffsets" ->
        (if (o == "beginning") "earliest" else o)) ++
      maxPerTrigger.map(n => "maxOffsetsPerTrigger" -> n.toString) ++
      extra.map { case (k, v) => s"kafka.$k" -> v }
}

object ConsumerConfig {
  /** Dynamic-options constructor mirroring the reference ctor contract;
    * `topicPattern` (regex) is accepted in place of `topic`. */
  def fromOptions(options: Map[String, Any]): ConsumerConfig = {
    Seq("host", "groupId").foreach(Options.require(options, _))
    val pattern = options.get("topicPattern").map(_.toString)
    if (pattern.isEmpty) Options.require(options, "topic")
    // both present → the case-class exclusivity require fires
    val topics = options.get("topic") match {
      case Some(s: String) => Seq(s)
      case Some(xs: Seq[_]) => xs.map(_.toString)
      case Some(other) => Seq(other.toString)
      case None => Seq.empty[String]
    }
    ConsumerConfig(
      host = options("host").toString,
      topics = topics,
      groupId = options("groupId").toString,
      fromOffset = options.get("fromOffset").map(_.toString),
      topicPattern = pattern)
  }
}

/** Producer-side config (reference: src/Producer.coffee:9-27).
  *
  * Unlike the reference — which silently drops keys
  * (src/Producer.coffee:74-78) and has broken per-message partition
  * routing (src/Producer.coffee:71) — keys and partitions are first-class:
  * a `key` / `partition` column in the output frame is honored by the sink.
  */
final case class ProducerConfig(
    host: String,
    topic: String,
    extra: Map[String, String] = Map.empty) {

  /** Options for `df.writeStream.format("kafka")`. */
  def writerOptions: Map[String, String] =
    Map("kafka.bootstrap.servers" -> host, "topic" -> topic) ++
      extra.map { case (k, v) => s"kafka.$k" -> v }
}

object ProducerConfig {
  def fromOptions(options: Map[String, Any]): ProducerConfig = {
    Seq("host", "topic").foreach(Options.require(options, _))
    ProducerConfig(options("host").toString, options("topic").toString)
  }
}
