package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Stateful/observability aggregations (A1, A6, A7) expressed as
 * queries. Under streaming these run with watermarks; as batch queries
 * they are the correctness-gated form. All are hash aggregations with
 * map-side partials — linear scans at 100 TB, no row explosion.
 */
object Observe {

  /**
   * Safe-checkpoint low-watermark (A1): per source partition the
   * committable offset is the largest prefix-acked offset, i.e. the
   * minimum in-flight offset minus one; the global safe checkpoint is
   * the minimum over partitions that still have in-flight records.
   * Reference: FlushlessEventProducerHandler.java:79-162 +
   * CallbackStatusWithComparableOffsets.java:23.
   *
   * Input: (partition, offset, acked: boolean).
   * Output: one row per partition with its safe checkpoint, where
   * safe = min(unacked) - 1, or max(acked) when nothing is in flight.
   */
  def safeCheckpoints(df: DataFrame, partition: Column, offset: Column, acked: Column): DataFrame =
    df.groupBy(partition.as("partition"))
      .agg(
        min(when(!acked, offset)).as("min_inflight"),
        max(when(acked, offset)).as("max_acked"))
      .select(
        col("partition"),
        coalesce(col("min_inflight") - 1, col("max_acked")).as("safe_checkpoint"))

  /**
   * A1 variant for NON-comparable offsets: when offsets carry no total
   * order (the reference's CallbackStatusWithNonComparableOffsets,
   * used when a connector's checkpoints are opaque tokens), the safe
   * checkpoint is the offset of the last acked record in ARRIVAL order
   * before the first unacked one — set-prefix semantics instead of
   * min/max arithmetic. Partitions with no committable prefix emit no
   * row (nothing safe to commit yet).
   *
   * Input: (partition, seq = arrival order, offset = opaque token,
   * acked). One window pass + one aggregation; both shuffle on the
   * partition key only.
   */
  def safeCheckpointsNonComparable(df: DataFrame, partition: Column,
      seq: Column, offset: Column, acked: Column): DataFrame = {
    val byPart = org.apache.spark.sql.expressions.Window.partitionBy(partition)
    df.withColumn("__first_unacked", min(when(!acked, seq)).over(byPart))
      .filter(acked &&
        (col("__first_unacked").isNull || seq < col("__first_unacked")))
      .groupBy(partition.as("partition"))
      .agg(max_by(offset, seq).as("safe_checkpoint"))
  }

  /**
   * Event-latency SLA accounting (A6): bucket events into fixed time
   * windows and count within/outside the availability SLA.
   * Reference: EventProducer.onSendCallback :676+, SLA thresholds
   * :114-119 (60 s main / 180 s alternate).
   */
  def slaWindows(df: DataFrame, latencyMs: Column,
      windowExpr: Column, slaMs: Long = 60000L, altSlaMs: Long = 180000L): DataFrame =
    df.groupBy(windowExpr.as("win"))
      .agg(
        count(lit(1)).as("events"),
        sum(when(latencyMs <= slaMs, 1L).otherwise(0L)).as("within_sla"),
        sum(when(latencyMs > slaMs, 1L).otherwise(0L)).as("outside_sla"),
        sum(when(latencyMs > altSlaMs, 1L).otherwise(0L)).as("outside_alt_sla"))

  /**
   * Throughput metering (A7): events/s and bytes/s per (window, route).
   * Reference: EventProducer.reportThroughputAttributionMetrics +
   * DynamicMetricsManager.java.
   */
  def throughput(df: DataFrame, windowExpr: Column, route: Column, payload: Column): DataFrame =
    df.groupBy(windowExpr.as("win"), route.as("route"))
      .agg(
        count(lit(1)).as("events"),
        sum(length(payload).cast("long")).as("bytes"))
}
