package graft

import graft.sources.{Duplex, JsonSerde}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.StreamingQueryException
import org.apache.spark.sql.types.StructType

/** Parity with the reference's end-to-end suites (SURVEY.md §5.1): the
  * duplex loopback test (test/test_getDuplex.coffee:57-76) — 1 000
  * messages in, filter `source === "origin"` (500 match), rewrite
  * `source` to "transform" — plus serde failure modes.
  */
class DuplexParitySpec extends SparkSpec {
  import spark.implicits._

  private val schema = new StructType()
    .add("source", "string").add("count", "long")
    .add("index", "long").add("timeout", "long")

  // Reference Burst payloads: half origin, half other (test_getDuplex.coffee:39)
  private def burst(n: Int): Seq[String] =
    (0 until n).map { i =>
      val src = if (i % 2 == 0) "origin" else "other"
      s"""{"source":"$src","count":${i / 100},"index":$i,"timeout":5}"""
    }

  test("duplex loopback: 1000 in, filter origin, transform, 500 out") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val raw = in.toDF().select(col("value"))

    val out = Duplex.transformPipeline(raw, schema, JsonSerde.FailFast) { payload =>
      payload.filter(col("source") === "origin")
        .withColumn("source", lit("transform"))
    }

    val query = out.writeStream.format("memory").queryName("duplex_out")
      .outputMode("append").start()
    try {
      in.addData(burst(1000): _*)
      query.processAllAvailable()
      val rows = spark.sql("SELECT value FROM duplex_out").as[String].collect()
      assert(rows.length === 500)
      assert(rows.forall(_.contains("\"source\":\"transform\"")))
      assert(!rows.exists(_.contains("\"source\":\"origin\"")))
    } finally query.stop()
  }

  test("FAILFAST serde kills the pipeline on malformed JSON (reference fail-stop)") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[String]
    val out = Duplex.transformPipeline(in.toDF().select(col("value")),
      schema, JsonSerde.FailFast)(identity)
    val query = out.writeStream.format("memory").queryName("failfast_out")
      .outputMode("append").start()
    try {
      in.addData("""{"source":"origin","count":1,"index":1,"timeout":5}""", "{not json!")
      val e = intercept[StreamingQueryException] { query.processAllAvailable() }
      assert(e.getMessage.toLowerCase.contains("malformed")
        || Option(e.getCause).exists(_.toString.toLowerCase.contains("malformed")))
    } finally query.stop()
  }

  test("PERMISSIVE serde dead-letters malformed records instead of failing") {
    val raw = Seq(
      """{"source":"origin","count":1,"index":1,"timeout":5}""",
      "{not json!").toDF("value")
    val decoded = JsonSerde.decode(raw, schema, JsonSerde.Permissive)
      .select(col("value.*"))
    val good = decoded.filter(col(JsonSerde.CorruptCol).isNull)
    val dead = decoded.filter(col(JsonSerde.CorruptCol).isNotNull)
    assert(good.count() === 1)
    assert(dead.count() === 1)
    assert(dead.select(JsonSerde.CorruptCol).as[String].head() === "{not json!")
  }

  test("splitDlq routes good rows typed and dead-letter rows with raw text + envelope") {
    val raw = Seq(
      ("t", 0, 7L, """{"source":"origin","count":1,"index":1,"timeout":5}"""),
      ("t", 0, 8L, "{not json!"),
      ("t", 1, 9L, """{"source":"other","count":2,"index":2,"timeout":5}"""))
      .toDF("topic", "partition", "offset", "value")
    val (good, bad) = JsonSerde.splitDlq(
      JsonSerde.decode(raw, schema, JsonSerde.Permissive))
    assert(good.count() === 2)
    // corrupt column stripped from the good payload struct
    assert(!good.select(col("value.*")).columns.contains(JsonSerde.CorruptCol))
    assert(good.select(col("value.source")).as[String].collect().sorted
      === Seq("origin", "other"))
    // dead letter keeps envelope + raw malformed text for replay
    val dl = bad.select(col("topic"), col("offset"), col("raw"))
      .as[(String, Long, String)].head()
    assert(dl === (("t", 8L, "{not json!")))
  }

  test("encode serializes whole row to JSON value; key/partition columns honored") {
    val df = Seq((1L, "origin", "k1", 3)).toDF("count", "source", "k", "p")
    val enc = JsonSerde.encode(df, keyCol = Some("k"), partitionCol = Some("p"))
    assert(enc.columns.toSet === Set("value", "key", "partition"))
    val row = enc.head()
    assert(row.getAs[String]("value").contains("\"source\":\"origin\""))
    assert(row.getAs[String]("key") === "k1")
    assert(row.getAs[Int]("partition") === 3)
  }

  test("inferSchema round-trips the duplex payload without a hand-written schema") {
    val raw = burst(100).toDF("value")
    val inferred = JsonSerde.inferSchema(raw)
    assert(inferred.fieldNames.sorted ===
      Array("count", "index", "source", "timeout"))
    // decode with the inferred schema ≡ decode with the declared one
    val viaInferred = JsonSerde.decodeInferred(raw, JsonSerde.FailFast)
      .select(col("value.source"), col("value.count"),
        col("value.index"), col("value.timeout"))
      .orderBy("index").collect().toSeq
    val viaDeclared = JsonSerde.decode(raw, schema, JsonSerde.FailFast)
      .select(col("value.source"), col("value.count"),
        col("value.index"), col("value.timeout"))
      .orderBy("index").collect().toSeq
    assert(viaInferred === viaDeclared)
  }

  test("decode keeps the envelope and replaces value with the parsed payload") {
    val raw = Seq(("t", 0, 7L, Array[Byte](1),
      new java.sql.Timestamp(0L),
      """{"source":"origin","count":2,"index":9,"timeout":5}"""))
      .toDF("topic", "partition", "offset", "key", "timestamp", "value")
    val decoded = JsonSerde.decode(raw, schema, JsonSerde.FailFast)
    assert(decoded.columns.toSet === Set("topic", "partition", "offset", "key", "timestamp", "value"))
    val r = decoded.select("topic", "offset", "value.source", "value.index").head()
    assert(r.getString(0) === "t" && r.getLong(1) === 7L)
    assert(r.getString(2) === "origin" && r.getLong(3) === 9L)
  }
}
