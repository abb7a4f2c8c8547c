package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Shared testdata readers.
 *
 * `events.parquet` carries TIMESTAMP(NANOS) which Spark cannot
 * represent (SPARK-40819): read the raw int64 nanos via the legacy
 * conf and truncate to microseconds — the same floor-truncation DuckDB
 * applies when casting TIMESTAMP_NS to TIMESTAMP, so both engines see
 * identical values.
 */
object Tables {

  def t(s: SparkSession, dir: String, name: String): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = s.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    else df
  }

  /** Raw file schema (ts still int64-nanos) for streaming readers. */
  def rawSchema(s: SparkSession, dir: String, name: String) = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/$name.parquet").schema
  }

  /**
   * events with a time predicate applied BEFORE the ns→µs conversion.
   *
   * A filter on the derived timestamp column cannot reach the parquet
   * scan (PushedFilters shows only IsNotNull); the conversion is
   * monotone (floor-division), so `micros(ts) < T ⟺ ts_ns < T·1000`
   * — rewriting into raw-nanos space turns a post-scan filter into a
   * pushed range predicate + row-group pruning. At 100 TB this is the
   * difference between scanning the full event log and touching only
   * in-range row groups.
   */
  def eventsBefore(s: SparkSession, dir: String, cutoffMicros: Long): DataFrame = {
    s.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    s.read.parquet(s"$dir/events.parquet")
      .filter(col("ts") < cutoffMicros * 1000L)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }
}
