package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.TimestampType

import graft.SparkTestBase

/**
 * Testdata-vintage canary. Round 9 lost 51 queries to a silent corpus
 * regeneration (ts int64-nanos → timestamp[us]) that only surfaced as
 * a suite-wide AnalysisException at driver time. This spec pins, per
 * scale factor, (a) that the shared reader resolves `ts` to canonical
 * TimestampType and (b) the exact epoch-micros the DuckDB oracle sees
 * for a known row — so the NEXT regeneration fails here, in one named
 * test with instructions, instead of in 51 gates.
 *
 * If this spec fails after a testdata refresh: re-derive the pins with
 *   duckdb: SELECT event_id, epoch_us(ts) FROM '<sf>/events.parquet'
 *           ORDER BY event_id LIMIT 1
 * and, if the dtype changed, add the new vintage branch in
 * Tables.normalizeEventTs / Tables.eventsBefore.
 */
class TablesSpec extends SparkTestBase {

  // (sfDir, rows, epoch-micros of min(ts), epoch-micros of the
  // event_id=0 row) — derived from DuckDB over the current corpus.
  private val pins = Seq(
    ("0.001", 1000L, 1704067798778549L, 1704067798778549L),
    ("0.01", 10000L, 1704067207179575L, 1704067207179575L),
    ("0.1", 100000L, 1704067211172425L, 1704067211172425L))

  for ((dir, rows, minMicros, firstMicros) <- pins) {
    test(s"events ts vintage canary at sf$dir") {
      val ev = Tables.t(spark, sf(dir), "events")
      assert(ev.schema("ts").dataType == TimestampType,
        "Tables.t must normalize ts to TimestampType for every vintage")
      val agg = ev.agg(
        count(lit(1)).as("n"),
        unix_micros(min(col("ts"))).as("min_us")).head()
      assert(agg.getLong(0) == rows, s"row count drifted at sf$dir")
      assert(agg.getLong(1) == minMicros,
        s"min(ts) micros drifted at sf$dir — testdata regenerated? " +
          "Re-derive TablesSpec pins via DuckDB epoch_us(ts)")
      val first = ev.filter(col("event_id") === 0L)
        .select(unix_micros(col("ts"))).head().getLong(0)
      assert(first == firstMicros,
        s"event_id=0 ts drifted at sf$dir — Spark no longer sees the " +
          "same micros as the DuckDB oracle")
    }
  }

  test("eventsBefore filters identically to a post-normalization filter") {
    // The pushdown rewrite must be semantics-preserving: the raw-space
    // range plus normalize ≡ normalize plus timestamp filter.
    val cutoff = 1704672000000000L // 2024-01-08T00:00:00Z
    val viaRaw = Tables.eventsBefore(spark, sf("0.001"), cutoff).count()
    val viaNorm = Tables.t(spark, sf("0.001"), "events")
      .filter(unix_micros(col("ts")) < cutoff).count()
    assert(viaRaw == viaNorm && viaRaw > 0)
  }
}
