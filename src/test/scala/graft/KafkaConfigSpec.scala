package graft

import graft.sources.{ConsumerConfig, ProducerConfig}

/** Option-validation parity with the reference ctor guards
  * (src/Consumer.coffee:18-19, src/Producer.coffee:15-16) and correct
  * option mapping onto the Spark Kafka connector. */
class KafkaConfigSpec extends SparkSpec {

  test("consumer requires host/topic/groupId with the reference's error text") {
    val e = intercept[IllegalArgumentException] {
      ConsumerConfig.fromOptions(Map("topic" -> "t", "groupId" -> "g"))
    }
    assert(e.getMessage === "No `host` in options")
    intercept[IllegalArgumentException] {
      ConsumerConfig.fromOptions(Map("host" -> "h", "groupId" -> "g"))
    }
    intercept[IllegalArgumentException] {
      ConsumerConfig.fromOptions(Map("host" -> "h", "topic" -> "t"))
    }
  }

  test("producer requires host/topic only") {
    val e = intercept[IllegalArgumentException] {
      ProducerConfig.fromOptions(Map("host" -> "h"))
    }
    assert(e.getMessage === "No `topic` in options")
    assert(ProducerConfig.fromOptions(Map("host" -> "h", "topic" -> "t")).topic === "t")
  }

  test("multi-topic subscribe normalizes string-or-seq (reference asArray)") {
    val one = ConsumerConfig.fromOptions(Map("host" -> "h", "topic" -> "t1", "groupId" -> "g"))
    assert(one.readerOptions("subscribe") === "t1")
    val many = ConsumerConfig.fromOptions(
      Map("host" -> "h", "topic" -> Seq("t1", "t2"), "groupId" -> "g"))
    assert(many.readerOptions("subscribe") === "t1,t2")
  }

  test("topicPattern maps to subscribePattern, mutually exclusive with subscribe") {
    val cfg = ConsumerConfig.fromOptions(
      Map("host" -> "h", "topicPattern" -> "metrics-.*", "groupId" -> "g"))
    assert(cfg.readerOptions("subscribePattern") === "metrics-.*")
    assert(!cfg.readerOptions.contains("subscribe"))
    val e = intercept[IllegalArgumentException] {
      ConsumerConfig.fromOptions(
        Map("host" -> "h", "topic" -> "t", "topicPattern" -> "t.*", "groupId" -> "g"))
    }
    assert(e.getMessage.contains("mutually exclusive"))
    // neither topic nor pattern → the reference's error text
    val e2 = intercept[IllegalArgumentException] {
      ConsumerConfig.fromOptions(Map("host" -> "h", "groupId" -> "g"))
    }
    assert(e2.getMessage === "No `topic` in options")
  }

  test("fromOffset maps to startingOffsets; rate bound + passthrough kafka.* options") {
    val cfg = ConsumerConfig("h:9092", Seq("t"), "g",
      fromOffset = Some("beginning"), maxPerTrigger = Some(16),
      extra = Map("socket.keepalive.enable" -> "true"))
    val o = cfg.readerOptions
    assert(o("startingOffsets") === "earliest")
    assert(o("maxOffsetsPerTrigger") === "16")
    assert(o("kafka.socket.keepalive.enable") === "true")
    assert(o("kafka.bootstrap.servers") === "h:9092")
    assert(o("kafka.group.id") === "g")
  }
}
