package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Stream-stream join with watermarks + time-range condition (SURVEY.md
  * §2.2): impressions joined to clicks within a bounded interval — the
  * canonical two-stream correlation. Both sides carry watermarks so join
  * state is evicted once the range can no longer match (bounded state at
  * scale). */
class StreamStreamJoinSpec extends SparkSpec {
  import spark.implicits._

  private def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")

  test("interval-bounded stream-stream inner join") {
    implicit val sc = spark.sqlContext
    val impressions = MemoryStream[(Long, Timestamp)]
    val clicks = MemoryStream[(Long, Timestamp)]

    val imp = impressions.toDF().toDF("ad", "imp_ts").withWatermark("imp_ts", "10 minutes")
    val clk = clicks.toDF().toDF("ad_c", "clk_ts").withWatermark("clk_ts", "10 minutes")

    val joined = imp.join(clk,
      col("ad") === col("ad_c") &&
        col("clk_ts") >= col("imp_ts") &&
        col("clk_ts") <= col("imp_ts") + expr("INTERVAL 5 MINUTES"))

    val q = joined.select("ad", "imp_ts", "clk_ts")
      .writeStream.format("memory").queryName("ssj_out").outputMode("append").start()
    try {
      impressions.addData((1L, ts(0)), (2L, ts(0)))
      clicks.addData((1L, ts(3)))   // within 5 min → joins
      clicks.addData((2L, ts(9)))   // 9 min later → outside the range
      q.processAllAvailable()
      val rows = spark.sql("SELECT ad FROM ssj_out").as[Long].collect().toSeq
      assert(rows === Seq(1L))
    } finally q.stop()
  }
}
