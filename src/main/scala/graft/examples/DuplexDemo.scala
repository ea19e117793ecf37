package graft.examples

import graft.GraftSession
import graft.sources.{Duplex, JsonSerde}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** Runnable demo of the reference's duplex loopback scenario
  * (test/test_getDuplex.coffee:57-76) on the engine: 1000 JSON messages,
  * keep `source == "origin"`, rewrite to `source = "transform"`.
  * With a Kafka cluster the same transform runs via Duplex.topology;
  * here a MemoryStream stands in for the topic.
  */
object DuplexDemo {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(cores = 4, appName = "duplex-demo")
    import spark.implicits._
    implicit val sc = spark.sqlContext

    val schema = new StructType()
      .add("source", "string").add("count", "long")
      .add("index", "long").add("timeout", "long")

    val in = MemoryStream[String]
    val out = Duplex.transformPipeline(in.toDF().select(col("value")),
      schema, JsonSerde.FailFast) { payload =>
      payload.filter(col("source") === "origin")
        .withColumn("source", lit("transform"))
    }

    val metrics = new graft.sources.DeliveryMetrics
    spark.streams.addListener(metrics)
    val query = out.writeStream.format("memory").queryName("bus")
      .outputMode("append").start()

    in.addData((0 until 1000).map { i =>
      val src = if (i % 2 == 0) "origin" else "other"
      s"""{"source":"$src","count":${i / 100},"index":$i,"timeout":5}"""
    }: _*)
    query.processAllAvailable()

    val n = spark.sql("SELECT count(*) FROM bus").head().getLong(0)
    val sample = spark.sql("SELECT value FROM bus LIMIT 2").collect().map(_.getString(0))
    graft.sources.Lifecycle.destroy(query)
    println(s"duplex-demo: transformed=$n (expect 500), delivered=${metrics.totalDelivered}")
    sample.foreach(s => println(s"  sample: $s"))
    spark.stop()
  }
}
