package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Auto-pause / auto-resume flow control (A4/A5) as a stateful
 * streaming operator.
 *
 * The reference pauses a source partition when a send fails or when
 * its in-flight count exceeds a max threshold, and resumes it once the
 * count drains below a min threshold or the pause duration elapses
 * (PausedSourcePartitionMetadata reasons SEND_ERROR /
 * EXCEEDED_MAX_IN_FLIGHT_MSG_THRESHOLD; thresholds
 * KafkaMirrorMakerConnectorTask.java:96-97 — 5000 max / 1000 min;
 * reconciliation pre-poll in
 * AbstractKafkaBasedConnectorTask.preConsumerPollHook :855+).
 *
 * Spark-first shape: the per-partition control loop is exactly
 * `flatMapGroupsWithState` keyed by source partition — Spark owns the
 * state store (checkpointed, recoverable), and the emitted decisions
 * drive the admission filter (Filters.notPaused / PipelineManager
 * .pausePartitions). State is O(#partitions), not O(#records), so the
 * operator scales with topology size, not data size. The per-group
 * sort materializes ONE INVOCATION's signals: under streaming that is
 * one micro-batch's worth per partition — bounded by trigger
 * admission (maxOffsetsPerTrigger), the same way the reference's
 * in-flight map is bounded by its poll batch. (Batch execution, as in
 * the q52 gate, folds a whole partition's history in one invocation —
 * fine for gating, not the deployment shape.)
 */
object FlowControl {

  /** One control signal per send attempt/ack: delta = +sent / -acked.
    * `seq` orders signals within a micro-batch (e.g. the source
    * offset): flatMapGroupsWithState gives NO iterator-order guarantee
    * inside a group, so the fold sorts by it — without a sequence the
    * decision stream would be nondeterministic across replays. */
  case class PartitionSignal(partition: String, delta: Long, error: Boolean,
      seq: Long = 0L)

  case class FlowState(inFlight: Long, paused: Boolean)

  /** Emitted only on transitions — the pause/resume command stream. */
  case class PauseDecision(partition: String, action: String, inFlight: Long)

  def autoPause(
      signals: Dataset[PartitionSignal],
      maxInFlight: Long = 5000L,
      minInFlight: Long = 1000L): Dataset[PauseDecision] = {
    import signals.sparkSession.implicits._
    signals
      .groupByKey(_.partition)
      .flatMapGroupsWithState[FlowState, PauseDecision](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (part, events, state: GroupState[FlowState]) =>
          var st = state.getOption.getOrElse(FlowState(0L, paused = false))
          val out = Seq.newBuilder[PauseDecision]
          events.toSeq.sortBy(_.seq).foreach { e =>
            val inFlight = math.max(0L, st.inFlight + e.delta)
            val shouldPause = e.error || inFlight > maxInFlight
            val next =
              if (!st.paused && shouldPause) {
                out += PauseDecision(part, "PAUSE", inFlight)
                FlowState(inFlight, paused = true)
              } else if (st.paused && !shouldPause && inFlight <= minInFlight) {
                out += PauseDecision(part, "RESUME", inFlight)
                FlowState(inFlight, paused = false)
              } else st.copy(inFlight = inFlight)
            st = next
          }
          state.update(st)
          out.result().iterator
      }
  }
}
