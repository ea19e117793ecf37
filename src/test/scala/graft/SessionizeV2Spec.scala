package graft

import graft.streaming.Pipelines.SessionEvent
import graft.streaming.StateV2
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import java.sql.Timestamp

/** Spark 4 state-API-v2 sessionization (transformWithState + RocksDB
  * state store) produces the same sessions as the v1 implementation. */
class SessionizeV2Spec extends SparkSpec {
  import spark.implicits._

  test("transformWithState sessionization closes sessions on gap + timer") {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      implicit val sc = spark.sqlContext
      val in = MemoryStream[SessionEvent]
      val sessions = StateV2.sessionize(in.toDS(), gapMs = 60000L, watermarkDelay = "0 seconds")
      val q = sessions.writeStream.format("memory").queryName("sess2_out")
        .outputMode("append").start()
      try {
        val base = Timestamp.valueOf("2024-01-01 10:00:00").getTime
        in.addData(SessionEvent(1L, base, 1.0), SessionEvent(1L, base + 10000, 2.0))
        q.processAllAvailable()
        in.addData(SessionEvent(1L, base + 600000, 5.0))
        q.processAllAvailable()
        in.addData(SessionEvent(1L, base + 1800000, 7.0))
        q.processAllAvailable()
        val out = spark.sql(
          "SELECT user_id, n_events, value_sum FROM sess2_out ORDER BY start_ms")
          .as[(Long, Int, Double)].collect().toSeq
        assert(out.nonEmpty)
        assert(out.head === ((1L, 2, 3.0)))
      } finally q.stop()
    } finally spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
  }
}
