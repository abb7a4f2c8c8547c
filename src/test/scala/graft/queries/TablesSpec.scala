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

  private def deleteTree(dir: String): Unit = {
    val root = java.nio.file.Paths.get(dir)
    if (java.nio.file.Files.exists(root)) {
      val walk = java.nio.file.Files.walk(root)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => java.nio.file.Files.deleteIfExists(p))
      finally walk.close()
    }
  }

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

  test("full corpus canary: every table's schema and sf0.001 row count") {
    // Round 9's collapse came from ONE table's silent dtype change.
    // Pin the reader-visible schema (post-normalization) and row count
    // of every table, so a regeneration of ANY vintage fails here with
    // the drifted table named. Timestamps are listed as `timestamp`
    // because Tables normalizes (events) or Spark reads timestamp[us]
    // with isAdjustedToUTC as-is; a revert to int64-nanos surfaces as a
    // bigint here for non-events tables and must get its own branch.
    val expect = Map(
      "customer" -> (150L, "c_custkey:bigint,c_name:string,c_nationkey:int,c_acctbal:double,c_mktsegment:string"),
      "documents" -> (500L, "doc_id:bigint,text:string,lang:string,source:string,n_chars:bigint"),
      "embeddings" -> (500L, "vec_id:bigint,embedding:array<float>,label:int"),
      "events" -> (1000L, "event_id:bigint,ts:timestamp,user_id:bigint,event_type:string,value:double,props:string"),
      "lineitem" -> (6000L, "l_orderkey:bigint,l_partkey:bigint,l_suppkey:bigint,l_linenumber:int,l_quantity:double,l_extendedprice:double,l_discount:double,l_tax:double,l_returnflag:string,l_linestatus:string,l_shipdate:timestamp_ntz"),
      "nation" -> (25L, "n_nationkey:int,n_name:string,n_regionkey:int"),
      "orders" -> (1500L, "o_orderkey:bigint,o_custkey:bigint,o_orderstatus:string,o_totalprice:double,o_orderdate:timestamp_ntz,o_orderpriority:string"),
      "part" -> (200L, "p_partkey:bigint,p_name:string,p_brand:string,p_type:string,p_size:int,p_retailprice:double"),
      "region" -> (5L, "r_regionkey:int,r_name:string"),
      "supplier" -> (10L, "s_suppkey:bigint,s_name:string,s_nationkey:int,s_acctbal:double"))
    for ((name, (rows, schemaStr)) <- expect.toSeq.sortBy(_._1)) {
      val df = Tables.t(spark, sf("0.001"), name)
      val got = df.schema.fields
        .map(f => s"${f.name}:${f.dataType.simpleString}").mkString(",")
      assert(got == schemaStr,
        s"$name schema drifted — testdata regenerated?\n got: $got\nwant: $schemaStr")
      assert(df.count() == rows, s"$name row count drifted at sf0.001")
    }
  }

  test("legacy int64-nanos vintage branch still normalizes and filters") {
    // The current corpus is timestamp[us]; keep the nanos branch alive
    // with a synthetic vintage so a corpus REVERT is also covered.
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-ns-vintage").toString
    val baseUs = 1704067200000000L // 2024-01-01T00:00:00Z in micros
    (0L until 10L).map(i => (i, baseUs * 1000L + i * 3600L * 1000000000L + 1500L))
      .toDF("event_id", "ts") // ts: int64 nanos (+1500ns proves truncation)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val norm = Tables.t(spark, dir, "events")
    assert(norm.schema("ts").dataType == TimestampType)
    val got = norm.orderBy("event_id").select(unix_micros(col("ts")))
      .as[Long].collect().toSeq
    assert(got == (0L until 10L).map(i => baseUs + i * 3600L * 1000000L + 1L),
      "nanos must floor-truncate to micros (1500ns -> 1us)")
    // range rewrite: cutoff at +5h keeps exactly events 0-4 and pushes
    // the predicate in nanos space
    val cutoff = baseUs + 5L * 3600L * 1000000L
    val before = Tables.eventsBefore(spark, dir, cutoff)
    assert(before.count() == 5)
    assert(before.schema("ts").dataType == TimestampType)
    deleteTree(dir)
  }

  test("native TimestampType vintage passes through untouched") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-tz-vintage").toString
    val baseUs = 1704067200000000L
    (0L until 10L)
      .map(i => (i, new java.sql.Timestamp((baseUs + i * 3600L * 1000000L) / 1000L)))
      .toDF("event_id", "ts")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val norm = Tables.t(spark, dir, "events")
    assert(norm.schema("ts").dataType == TimestampType)
    assert(norm.count() == 10)
    val cutoff = baseUs + 5L * 3600L * 1000000L
    assert(Tables.eventsBefore(spark, dir, cutoff).count() == 5)
    deleteTree(dir)
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
