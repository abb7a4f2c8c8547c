package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/**
 * Shared testdata readers.
 *
 * `events.parquet` has shipped in two vintages: TIMESTAMP(NANOS)
 * (which Spark cannot represent — SPARK-40819 — and reads as raw
 * int64 under the legacy conf) and timestamp[us] with
 * isAdjustedToUTC=false (which Spark reads as TIMESTAMP_NTZ). The
 * reference survives upstream schema drift by treating payloads as
 * opaque bytes behind a registry decode (DatastreamEvent.avsc); this
 * reader is the engine's equivalent choke point, so it must tolerate
 * every vintage instead of hard-coding one. `normalizeEventTs` maps
 * each known vintage to ONE canonical column type — TimestampType,
 * UTC epoch micros (all graft sessions pin
 * spark.sql.session.timeZone=UTC, making the NTZ→TZ cast numerically
 * the identity) — and fails loudly, in one place, on an unknown one.
 * DuckDB (the oracle) reads the same file natively in µs, so both
 * engines see identical values in every branch.
 */
object Tables {

  /**
   * Normalize an `events` frame's `ts` column to TimestampType (UTC
   * epoch micros) regardless of the parquet vintage it was read from.
   * Works on batch and streaming frames alike.
   */
  def normalizeEventTs(df: DataFrame): DataFrame = df.schema("ts").dataType match {
    // int64-nanos vintage read under spark.sql.legacy.parquet.nanosAsLong:
    // floor-truncate to micros, exactly DuckDB's TIMESTAMP_NS→TIMESTAMP cast.
    case LongType => df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    // timestamp[us] isAdjustedToUTC=false vintage: loads as NTZ; the cast
    // re-tags the same micros as UTC-epoch — numerically the identity
    // ONLY under a UTC session tz, so enforce the premise instead of
    // assuming it (entry points like spark-shell don't pin it).
    case TimestampNTZType =>
      val tz = df.sparkSession.conf.get("spark.sql.session.timeZone")
      require(tz == "UTC",
        s"events NTZ ts normalization requires spark.sql.session.timeZone=UTC " +
          s"(session has '$tz'); a non-UTC cast would shift every event time")
      df.withColumn("ts", col("ts").cast(TimestampType))
    // timestamp[us] isAdjustedToUTC=true vintage: already canonical.
    case TimestampType => df
    case other => throw new IllegalStateException(
      s"events.parquet ts column arrived as $other — a new testdata vintage; " +
        "add a branch in Tables.normalizeEventTs (and update TablesSpec pins)")
  }

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    // No-op for µs vintages; required to read the int64-nanos vintage.
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events") normalizeEventTs(df) else df
  }

  /** Raw file schema (ts NOT yet normalized) for streaming readers. */
  def rawSchema(s: SparkSession, dir: String, name: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet").schema
  }

  /**
   * events with a time predicate applied BEFORE ts normalization.
   *
   * A filter on a derived timestamp column cannot reach the parquet
   * scan (PushedFilters shows only IsNotNull). Each vintage branch
   * rewrites the cutoff into the FILE's native ts space and filters
   * the raw column, so the range predicate pushes into the scan and
   * prunes row groups. At 100 TB this is the difference between
   * scanning the full event log and touching only in-range row groups.
   */
  def eventsBefore(s: SparkSession, dir: String, cutoffMicros: Long): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/events.parquet")
    val filtered = df.schema("ts").dataType match {
      // micros(ts) < T ⟺ ts_ns < T·1000 (floor-division is monotone)
      case LongType => df.filter(col("ts") < cutoffMicros * 1000L)
      case TimestampNTZType =>
        val cutoff = java.time.LocalDateTime.ofEpochSecond(
          Math.floorDiv(cutoffMicros, 1000000L),
          (Math.floorMod(cutoffMicros, 1000000L) * 1000L).toInt,
          java.time.ZoneOffset.UTC)
        df.filter(col("ts") < lit(cutoff))
      case TimestampType =>
        df.filter(col("ts") < lit(java.sql.Timestamp.from(
          java.time.Instant.EPOCH.plus(cutoffMicros, java.time.temporal.ChronoUnit.MICROS))))
      case other => throw new IllegalStateException(
        s"events.parquet ts column arrived as $other — a new testdata vintage; " +
          "add a branch in Tables.eventsBefore (and update TablesSpec pins)")
    }
    normalizeEventTs(filtered)
  }
}
