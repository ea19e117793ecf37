package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TimeMode, TimerValues, ValueState}
import graft.streaming.Pipelines.{SessionEvent, SessionOut, SessionState}

/** Sessionization on Spark 4's state API v2 (`transformWithState`) —
  * the successor to flatMapGroupsWithState: typed state handles
  * (ValueState/ListState/MapState), event-time timers, and a RocksDB
  * state store (changelog-checkpointed, state size bounded by disk not
  * heap — the 100 TB-of-state story).
  *
  * Same semantics as [[Pipelines.sessionize]]: a session closes after
  * `gapMs` of event-time silence, flushed via timer.
  */
object StateV2 {

  final class SessionProcessor(gapMs: Long)
      extends StatefulProcessor[Long, SessionEvent, SessionOut] {

    @transient private var state: ValueState[SessionState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      state = getHandle.getValueState[SessionState](
        "session", Encoders.product[SessionState], org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[SessionEvent],
                                 timerValues: TimerValues): Iterator[SessionOut] = {
      val sorted = rows.toSeq.sortBy(_.ts_ms)
      var st = Option(state.get()).getOrElse(null)
      val closed = Seq.newBuilder[SessionOut]
      for (e <- sorted) {
        if (st == null) st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
        else if (e.ts_ms - st.last > gapMs) {
          closed += SessionOut(key, st.start, st.last, st.n, st.sum)
          st = SessionState(e.ts_ms, e.ts_ms, 1, e.value)
        } else st = SessionState(st.start, e.ts_ms, st.n + 1, st.sum + e.value)
      }
      if (st != null) {
        state.update(st)
        getHandle.registerTimer(st.last + gapMs)
      }
      closed.result().iterator
    }

    override def handleExpiredTimer(key: Long, timerValues: TimerValues,
        expiredTimerInfo: org.apache.spark.sql.streaming.ExpiredTimerInfo): Iterator[SessionOut] = {
      val st = state.get()
      if (st != null && expiredTimerInfo.getExpiryTimeInMs() >= st.last + gapMs) {
        state.clear()
        Iterator.single(SessionOut(key, st.start, st.last, st.n, st.sum))
      } else Iterator.empty
    }
  }

  /** Requires the RocksDB state store provider (set in the session conf;
    * see SessionizeV2Spec). */
  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String): Dataset[SessionOut] = {
    import events.sparkSession.implicits._
    events
      .withColumn("eventTime", org.apache.spark.sql.functions.timestamp_millis(
        org.apache.spark.sql.functions.col("ts_ms")))
      .withWatermark("eventTime", watermarkDelay)
      .as[SessionEvent]
      .groupByKey(_.user_id)
      .transformWithState(new SessionProcessor(gapMs),
        TimeMode.EventTime(), OutputMode.Append())
  }
}
