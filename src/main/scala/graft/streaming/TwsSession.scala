package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State row for [[TwsSessionProcessor]]: events in the open session
  * and its last event time (ms). */
case class SessState(nEvents: Long, lastTsMs: Long)

/** A closed session: emitted ONLY from an expired event-time timer —
  * the row exists because the watermark proved the user went quiet. */
case class SessionClosed(user_id: Long, n_events: Long, last_ts_ms: Long)

/**
 * Event-time inactivity sessionizer on Spark 4's arbitrary-state API
 * using TIMERS — the third leg of the custom-state surface after
 * flatMapGroupsWithState (s09) and transformWithState ValueState
 * (s11): a session closes not when new data says so but when the
 * WATERMARK passes `last event + gap`, which only a registered timer
 * can observe. This is the reference's auto-resume-after-quiet shape
 * (`PausedSourcePartitionMetadata` duration predicates) expressed on
 * real event time.
 *
 * One active timer per key: every input batch re-arms the timer at the
 * merged session's `last + gap`, deleting the stale one; expiry emits
 * the closed session and clears state, so the next event starts a new
 * session. State per key is one (count, ts) pair — 100 TB-safe.
 */
class TwsSessionProcessor(gapMs: Long)
    extends StatefulProcessor[Long, (Long, java.sql.Timestamp), SessionClosed] {

  @transient private var state: ValueState[SessState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessState]("session",
      Encoders.product[SessState], TTLConfig.NONE)

  override def handleInputRows(user: Long,
      rows: Iterator[(Long, java.sql.Timestamp)],
      timers: TimerValues): Iterator[SessionClosed] = {
    var n = 0L
    var maxTs = Long.MinValue
    rows.foreach { case (_, ts) =>
      n += 1
      if (ts.getTime > maxTs) maxTs = ts.getTime
    }
    val st = if (state.exists()) state.get() else SessState(0L, Long.MinValue)
    val merged = SessState(st.nEvents + n, math.max(st.lastTsMs, maxTs))
    state.update(merged)
    getHandle.listTimers().foreach(getHandle.deleteTimer)
    getHandle.registerTimer(merged.lastTsMs + gapMs)
    Iterator.empty
  }

  override def handleExpiredTimer(user: Long, timerValues: TimerValues,
      expired: ExpiredTimerInfo): Iterator[SessionClosed] = {
    val st = state.get()
    state.clear()
    Iterator(SessionClosed(user, st.nEvents, st.lastTsMs))
  }
}
