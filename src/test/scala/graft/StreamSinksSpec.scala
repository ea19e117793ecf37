package graft

import graft.streaming.{Pipelines, StreamSinks}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp
import java.util.concurrent.ConcurrentLinkedQueue

class StreamSinksSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("foreachBatch receives every micro-batch as a batch DataFrame") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Long]
    val seen = new ConcurrentLinkedQueue[(Long, Long)]()
    val q = StreamSinks.foreachBatchSink(in.toDF()) { (batch, id) =>
      seen.add(id -> batch.count())
    }.start()
    try {
      in.addData(1L, 2L, 3L); q.processAllAvailable()
      in.addData(4L); q.processAllAvailable()
      val counts = seen.toArray(Array.empty[(Long, Long)]).toSeq.filter(_._2 > 0)
      assert(counts.map(_._2) === Seq(3L, 1L))
    } finally q.stop()
  }

  test("update output mode re-emits amended window counts") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val counts = Pipelines.windowedCounts(
      in.toDF().toDF("ts", "uid"), "ts", "10 minutes", "5 minutes")
    val q = counts.writeStream.format("memory").queryName("upd_out")
      .outputMode("update").start()
    try {
      in.addData((ts(0), 1L)); q.processAllAvailable()
      in.addData((ts(1), 2L)); q.processAllAvailable()
      // update mode: the 10:00 window appears twice, n=1 then n=2
      val ns = spark.sql("SELECT n FROM upd_out ORDER BY n").as[Long].collect().toSeq
      assert(ns === Seq(1L, 2L))
    } finally q.stop()
  }

  test("complete output mode re-emits the full aggregate each batch") {
    implicit val sc = spark.sqlContext
    val in = MemoryStream[Long]
    val agg = in.toDF().toDF("uid").groupBy($"uid").count()
    val q = agg.writeStream.format("memory").queryName("cmp_out")
      .outputMode("complete").start()
    try {
      in.addData(7L, 7L, 8L); q.processAllAvailable()
      val rows = spark.sql("SELECT uid, count FROM cmp_out ORDER BY uid")
        .as[(Long, Long)].collect().toSeq
      assert(rows === Seq((7L, 2L), (8L, 1L)))
    } finally q.stop()
  }

  test("manifestSink: torn batches invisible, replays idempotent, committed union exact") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val out = java.nio.file.Files.createTempDirectory("manifest").toFile
    out.delete()
    val dir = out.getAbsolutePath
    val sink = graft.streaming.Pipelines.manifestSink(dir)
    def committed() = graft.streaming.Pipelines.readCommitted(spark, dir)
      .select(col("id")).as[Long].collect().toSet

    sink(Seq(1L, 2L).toDF("id"), 0L)
    assert(committed() === Set(1L, 2L))
    // CRASH simulation: batch 1's data lands but the commit never runs
    Seq(3L, 4L).toDF("id").write.mode("overwrite")
      .parquet(s"$dir/data/batch=1")
    assert(committed() === Set(1L, 2L), "torn batch must be invisible")
    // re-delivery completes the batch exactly once
    sink(Seq(3L, 4L).toDF("id"), 1L)
    assert(committed() === Set(1L, 2L, 3L, 4L))
    // replay of a committed batch: data overwrite + manifest no-op
    sink(Seq(1L, 2L).toDF("id"), 0L)
    assert(committed() === Set(1L, 2L, 3L, 4L))
    assert(graft.streaming.Pipelines.readCommitted(spark, dir).count() === 4L)
  }
}
