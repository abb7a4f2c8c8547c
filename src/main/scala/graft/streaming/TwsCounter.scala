package graft.streaming

import org.apache.spark.sql.Encoders
import org.apache.spark.sql.streaming.{OutputMode, StatefulProcessor, TTLConfig, TimeMode, TimerValues, ValueState}

/** State row for [[TwsCounterProcessor]]: running totals plus the batch
  * ordinal where the user first appeared (pure state memory — only a
  * store that survived every restart can report it correctly). */
case class TwsState(nEvents: Long, nBatches: Long, firstBatch: Long)

/** Output row: the user's post-batch running totals. */
case class TwsUpdate(user_id: Long, n_events: Long, n_batches: Long,
  first_batch: Long)

/**
 * Per-user running counter on Spark 4's arbitrary-state API
 * (transformWithState + ValueState, RocksDB state store) — the modern
 * replacement for flatMapGroupsWithState (s09) and the engine's
 * A4-family custom-state surface on the API a new pipeline should use:
 * typed named state, TTL support, and timers, with state evolution
 * handled by the store rather than one opaque case-class blob.
 *
 * Input rows are (event_id, user_id); the batch ordinal is recovered
 * from event_id % 3 (the harness splits the corpus that way, so every
 * row in a micro-batch agrees on it).
 */
class TwsCounterProcessor
    extends StatefulProcessor[Long, (Long, Long), TwsUpdate] {

  @transient private var state: ValueState[TwsState] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[TwsState]("counter",
      Encoders.product[TwsState], TTLConfig.NONE)

  override def handleInputRows(user: Long, rows: Iterator[(Long, Long)],
      timers: TimerValues): Iterator[TwsUpdate] = {
    var n = 0L
    var batch = 0L
    rows.foreach { case (eventId, _) => n += 1; batch = eventId % 3 }
    val st = if (state.exists()) state.get() else TwsState(0L, 0L, batch)
    val next = TwsState(st.nEvents + n, st.nBatches + 1, st.firstBatch)
    state.update(next)
    Iterator(TwsUpdate(user, next.nEvents, next.nBatches, next.firstBatch))
  }
}
