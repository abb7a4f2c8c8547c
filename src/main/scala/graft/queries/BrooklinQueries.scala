package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.operators.{AsOfJoin, Control, Filters, IntervalJoin, Observe, Partitioning, Translate}
import graft.serde.{AvroSerde, SchemaRegistry}
import graft.sources.ChunkedJdbc

/**
 * The reference's data-plane + control-plane operator inventory
 * (SURVEY.md §2) expressed as batch queries over the shared testdata,
 * each paired with an ANSI-SQL oracle (DuckDB dialect) computing the
 * identical result. The `events` table stands in for the Kafka record
 * stream: topic=event_type, partition=user_id mod 8, offset=event_id,
 * key=user_id, value=props.
 */
object BrooklinQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  /** events → Kafka-record shape shared by several queries. */
  private def kafkaShaped(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("topic"),
      pmod(col("user_id"), lit(8L)).as("partition"),
      col("event_id").as("offset"),
      col("user_id").cast("string").as("key"),
      col("props").as("value"),
      col("ts"))

  private val kafkaShapedSql =
    """SELECT event_type AS topic, MOD(user_id, 8) AS partition,
      |event_id AS "offset", CAST(user_id AS VARCHAR) AS key,
      |props AS value, ts FROM events""".stripMargin.replace("\n", " ")

  /** Paused (topic-partition) admission set shared by q22. */
  private val PausedSet = Seq("click-2", "view-5", "purchase-0")

  /** Per-(topic, partition) bytes-in rate — the packing input (P4). */
  private def partitionRates(s: SparkSession, d: String): DataFrame =
    kafkaShaped(t(s, d, "events"))
      .groupBy(col("topic"), col("partition"))
      .agg(sum(length(col("value")).cast("long")).as("bytes_rate"))

  private val partitionRatesSql =
    s"""SELECT topic, partition, CAST(SUM(length(value)) AS BIGINT) AS bytes_rate
       |FROM ($kafkaShapedSql) GROUP BY 1, 2""".stripMargin.replace("\n", " ")

  private val loadPackSql =
    s"""SELECT topic, partition, bytes_rate, rank, MOD(rank - 1, 4) AS task FROM (
       |SELECT *, ROW_NUMBER() OVER (ORDER BY bytes_rate DESC, topic, partition) AS rank
       |FROM ($partitionRatesSql))""".stripMargin.replace("\n", " ")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // A7-flavored flow aggregation — the basic scan+agg shape.
    "q01_flow_agg" -> ((s, d) =>
      t(s, d, "events").groupBy(col("event_type"))
        .agg(
          count(lit(1)).as("n"),
          sum(length(col("props")).cast("long")).as("bytes"),
          min(col("event_id")).as("min_id"),
          max(col("event_id")).as("max_id"))),

    // T1/P1: mirror translate with metadata enrichment + dest-topic
    // substitution + checkpoint string + identity partitioning.
    "q02_mirror_translate" -> ((s, d) =>
      Translate.mirror(kafkaShaped(t(s, d, "events")), "mirror.%s", "p-")),

    // F3/S7: hash-shard predicate for parallel snapshot reads.
    "q03_hash_shard" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(Filters.hashShard(
          Seq(col("l_orderkey"), col("l_linenumber")), 8, Seq(0, 3)))
        .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))),

    // F4/O1: composite-key seek + ordered chunk (the chunked-JDBC read).
    "q04_seek_chunk" -> ((s, d) =>
      t(s, d, "lineitem")
        .filter(Filters.seekAfter(
          Seq(col("l_orderkey"), col("l_linenumber")), Seq(1000L, 2)))
        .orderBy(col("l_orderkey"), col("l_linenumber"))
        .limit(500)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_extendedprice"))),

    // T5 completeness: the reference's deliberate CDC-bootstrap type
    // semantics (NUMBER→string with precision metadata, TIMESTAMP→
    // epoch-ms long, RAW/BLOB→bytes) exercised over a LIVE embedded
    // Derby round-trip: orders slice → Derby (DECIMAL/TIMESTAMP/BLOB/
    // CLOB columns) → 4-shard chunked parallel read → typed
    // projection, hash-compared against DuckDB computing the same
    // projection straight from the parquet.
    "q49_cdc_typed" -> ((s, d) => {
      val url = s"jdbc:derby:memory:graft_q49_${math.abs(d.hashCode)};create=true"
      val props = new java.util.Properties
      props.setProperty("driver", "org.apache.derby.jdbc.EmbeddedDriver")
      t(s, d, "orders").filter(col("o_orderkey") <= 1000)
        .select(
          col("o_orderkey"),
          col("o_totalprice").cast("decimal(12,2)").as("price"),
          col("o_orderdate").as("order_ts"),
          col("o_orderstatus").cast("binary").as("status_raw"),
          col("o_orderpriority").as("priority"))
        .write.mode("overwrite").jdbc(url, "GRAFT_BOOTSTRAP", props)
      // Spark writes case-exact quoted identifiers to Derby, so the
      // shard key must be quoted the same way in the pushed predicate.
      ChunkedJdbc.bootstrapProjection(
          ChunkedJdbc.readNumeric(s, url, "GRAFT_BOOTSTRAP", "\"o_orderkey\"",
            numShards = 4, props))
        .select(
          col("o_orderkey"),
          col("price").as("price_str"),
          col("order_ts").as("order_ts_ms"),
          lower(hex(col("status_raw"))).as("status_hex"),
          col("priority"))
    }),

    // The full load-based assignment composition the reference runs:
    // ESTIMATE the task count from per-partition throughput (q48's
    // estimator, tighter capacity so the count is non-trivial), then
    // PACK the partitions into exactly that many tasks — q48 feeding
    // q27, all relational (the estimated count joins the ranked
    // partitions as a one-row broadcast; no driver round-trip).
    "q50_elastic_pack" -> ((s, d) => {
      val pr = partitionRates(s, d).filter(col("topic") === "click")
      val universe = pr.select(lit("click").as("stream"),
        concat_ws("-", col("topic"), col("partition")).as("part_name"))
      val rates = pr.select(
        concat_ws("-", col("topic"), col("partition")).as("name"),
        expr("bytes_rate div 1024").as("kb_rate"))
      // Floor at 1: integer-KB rates can sum to 0 at tiny scale, and a
      // stream that HAS partitions needs at least one task to drain it
      // (the estimator itself mirrors the reference and may say 0).
      val est = Control.taskCountEstimate(universe, rates,
          capacityMBps = 1, utilizationPct = 50, defaultKbRate = 5)
        .select(greatest(lit(1L), col("task_count")).as("task_count"))
      Control.loadPack(pr, col("bytes_rate"),
          Seq(col("topic"), col("partition")), numTasks = 1)
        .drop("task")
        .crossJoin(broadcast(est))
        .withColumn("task", pmod(col("rank") - 1, col("task_count")))
        .select(col("topic"), col("partition"), col("bytes_rate"),
          col("rank"), col("task_count"), col("task"))
    }),

    // O2/O3: top-k by load.
    "q05_topk" -> ((s, d) =>
      t(s, d, "orders")
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(10)
        .select(col("o_orderkey"), col("o_totalprice"))),

    // O4: paging.
    "q06_paging" -> ((s, d) =>
      Control.page(t(s, d, "orders"),
          Seq(col("o_orderkey")), start = 200, count = 100)
        .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"))),

    // D1: destination-reuse dedup.
    "q07_dest_reuse" -> ((s, d) =>
      Control.destinationReuse(t(s, d, "documents"), "source", "doc_id")
        .select(col("doc_id"), col("source"), col("canonical_id"))),

    // D3: assignment diff (added = new \ old) at (user, day) task
    // granularity.
    "q08_assignment_diff" -> ((s, d) => {
      val e = t(s, d, "events")
        .withColumn("day", date_trunc("day", col("ts")))
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("day")).distinct()
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("day")).distinct()
      Control.added(clicks, purchases)
    }),

    // P3/K2: broadcast fan-out to every destination partition.
    "q09_broadcast_fanout" -> ((s, d) =>
      Partitioning.broadcastFanOut(
          t(s, d, "events").filter(col("event_id") < 100), 4)
        .select(col("event_id"), col("dest_partition"))),

    // A1: flushless safe-checkpoint low-watermark.
    "q10_safe_checkpoints" -> ((s, d) =>
      Observe.safeCheckpoints(t(s, d, "events"),
          pmod(col("user_id"), lit(8L)), col("event_id"), col("value") < 30.0)
        .withColumnRenamed("partition", "part")),

    // A1 (non-comparable offsets): opaque checkpoint tokens carry no
    // order, so the safe checkpoint is the last acked token in ARRIVAL
    // order before the first unacked record — set-prefix semantics.
    // Reference: CallbackStatusWithNonComparableOffsets.java.
    "q37_safe_checkpoints_nc" -> ((s, d) =>
      Observe.safeCheckpointsNonComparable(
        t(s, d, "events").select(
          pmod(col("user_id"), lit(8L)).as("part"),
          col("event_id").as("seq"),
          concat(lit("o-"), md5(col("event_id").cast("string"))).as("tok"),
          (col("value") < 30.0).as("acked")),
        partition = col("part"), seq = col("seq"),
        offset = col("tok"), acked = col("acked"))),

    // A6: SLA latency windows.
    "q11_sla_windows" -> ((s, d) =>
      Observe.slaWindows(t(s, d, "events"),
        latencyMs = col("value") * 1000,
        windowExpr = date_trunc("hour", col("ts")))),

    // A7: throughput metering per (window, route).
    "q12_throughput" -> ((s, d) =>
      Observe.throughput(t(s, d, "events"),
        date_trunc("hour", col("ts")), col("event_type"), col("props"))),

    // A10: diagnostics scatter-gather reduce (two-level agg).
    "q13_diag_reduce" -> ((s, d) =>
      Control.diagReduce(t(s, d, "events"),
        hostCol = concat(lit("host-"), pmod(col("user_id"), lit(16L)).cast("string")),
        statusCol = Translate.opcodeOf(col("event_type")),
        metric = col("event_id"))),

    // §2.9 scalar-function surface.
    "q14_scalar_funcs" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") < 50).select(
        col("event_id"),
        md5(col("props")).as("md5_hex"),
        concat(lit("dest-"), col("event_type"), lit("-"),
          pmod(col("user_id"), lit(4L)).cast("string")).as("dest"),
        date_format(col("ts"), "yyyyMMddHHmmss").as("ts_code"),
        get_json_object(col("props"), "$.k").as("k_val"),
        col("event_type").rlike("^(click|view)$").as("is_click_view"))),

    // T6: registry envelope framing (magic ‖ md5(schemaId) ‖ payload).
    "q15_registry_frame" -> ((s, d) =>
      t(s, d, "events").filter(col("event_id") < 1000).select(
        col("event_id"),
        Portable.registryFrameHex(col("user_id"), col("props")).as("framed_hex"))),

    // T7: CDC opcode classification + exact decimal rollup.
    "q16_cdc_opcodes" -> ((s, d) =>
      t(s, d, "events")
        .groupBy(Translate.opcodeOf(col("event_type")).as("opcode"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("value").cast("decimal(18,2)")).cast("double").as("value_total"))),

    // F5: TTL expiry filter, rewritten into raw-nanos space so the
    // range predicate pushes into the parquet scan (see Tables).
    // 2024-01-08T00:00:00Z = 1704672000000000 µs since epoch.
    "q17_ttl_filter" -> ((s, d) =>
      Tables.eventsBefore(s, d, 1704672000000000L)
        .groupBy(col("event_type"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))),

    // T3/S5: file-line translate.
    "q18_file_lines" -> ((s, d) =>
      Translate.fileLines(t(s, d, "documents"),
        lineNo = col("doc_id"), line = col("text"),
        ingestTs = to_timestamp(lit("2024-01-01 00:00:00")))),

    // F1: topic whitelist regex.
    "q19_topic_whitelist" -> ((s, d) =>
      kafkaShaped(t(s, d, "events"))
        .filter(Filters.topicWhitelist(col("topic"), "^(click|view)$"))
        .groupBy(col("topic")).agg(count(lit(1)).as("n"))),

    // P2: key-hash partitioning distribution.
    "q20_key_partition" -> ((s, d) =>
      kafkaShaped(t(s, d, "events"))
        .groupBy(Partitioning.byKey(col("key"), 16).as("part"))
        .agg(count(lit(1)).as("n"))),

    // F2/A4: paused-partition admission filter — records of paused
    // (topic, partition) pairs are dropped before the sink.
    "q22_paused_filter" -> ((s, d) =>
      kafkaShaped(t(s, d, "events"))
        .filter(Filters.notPaused(
          concat_ws("-", col("topic"), col("partition")), PausedSet))
        .groupBy(col("topic"), col("partition"))
        .agg(count(lit(1)).as("n"), max(col("offset")).as("max_offset"))),

    // F6: skip-on-serialization-error — frame every payload with the
    // registry envelope, corrupt a deterministic subset's magic byte,
    // and count delivered vs skipped per topic (EventProducer
    // :322-338's dead-letter counter as a query).
    "q23_serde_skip" -> ((s, d) => {
      val framed = t(s, d, "events").select(
        col("event_type").as("topic"),
        concat(
          when(pmod(col("event_id"), lit(7L)) === 0, lit("ff")).otherwise(lit("00")),
          md5(col("user_id").cast("string")),
          lower(hex(encode(col("props"), "utf-8")))).as("frame"))
      framed.groupBy(col("topic")).agg(
        count(when(Filters.frameOk(col("frame")), 1)).as("delivered"),
        count(when(!Filters.frameOk(col("frame")), 1)).as("skipped"))
    }),

    // D2: BYOT destination-conflict check — proposed destinations that
    // intersect existing ones (semi-join), rolled up per destination.
    "q24_byot_conflict" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val existing = docs.filter(col("doc_id") < 250).select(col("source"))
      val proposed = docs.filter(col("doc_id") >= 250)
        .select(col("doc_id"), col("source"))
      Control.destinationConflicts(proposed, existing, "source")
        .groupBy(col("source")).agg(count(lit(1)).as("n_conflicts"))
    }),

    // T2: single-topic translate — source timestamp depends on the
    // record's timestamp type (CREATE_TIME keeps the producer stamp,
    // LOG_APPEND/NONE falls back to read time).
    "q25_single_topic_translate" -> ((s, d) =>
      Translate.singleTopic(
          kafkaShaped(t(s, d, "events"))
            .withColumn("timestamp_type", pmod(col("offset"), lit(2L))),
          readTime = to_timestamp(lit("2024-02-01 00:00:00")))
        .select(col("offset").as("event_id"), col("timestamp_type"),
          col("source_timestamp"))),

    // T4/S6: directory change event → envelope (key = path,
    // value = change kind).
    "q26_dir_events" -> ((s, d) => {
      val m = pmod(col("doc_id"), lit(3L))
      Translate.dirEvent(t(s, d, "documents"),
        path = concat(lit("/data/"), col("source"), lit("/"),
          col("doc_id").cast("string"), lit(".txt")),
        kind = when(m === 0, lit("ENTRY_CREATE"))
          .when(m === 1, lit("ENTRY_MODIFY"))
          .otherwise(lit("ENTRY_DELETE")))
    }),

    // O3/P4: throughput-descending partition packing across tasks.
    "q27_load_packing" -> ((s, d) =>
      Control.loadPack(partitionRates(s, d),
        col("bytes_rate"), Seq(col("topic"), col("partition")), numTasks = 4)),

    // O2: least-loaded task selection over the packed assignment.
    "q28_min_load_task" -> ((s, d) =>
      Control.loadPack(partitionRates(s, d),
          col("bytes_rate"), Seq(col("topic"), col("partition")), numTasks = 4)
        .groupBy(col("task"))
        .agg(count(lit(1)).as("n_parts"), sum(col("bytes_rate")).as("load"))
        .orderBy(col("load"), col("task")).limit(1)),

    // Elastic task-count estimation: each topic is a datastream over
    // partitions 0..9; the throughput table carries per-partition
    // entries for partitions 0..5 only and topic-level entries for
    // click/purchase, so the estimate exercises all three lookup
    // tiers (partition → topic fallback → default) before the
    // ceil-over-capacity division and the partition-count clamp.
    "q48_task_count" -> ((s, d) => {
      val pr = partitionRates(s, d)
      val perPartition = pr.filter(col("partition") <= 5)
        .select(concat_ws("-", col("topic"), col("partition")).as("name"),
          expr("bytes_rate div 1024").as("kb_rate"))
      val topicLevel = pr.filter(col("topic").isin("click", "purchase"))
        .groupBy(col("topic"))
        .agg(expr("(sum(bytes_rate) div count(*)) div 1024").as("kb_rate"))
        .select(col("topic").as("name"), col("kb_rate"))
      val universe = pr.select(col("topic")).distinct()
        .select(col("topic").as("stream"),
          explode(sequence(lit(0), lit(9))).as("p"))
        .select(col("stream"),
          concat_ws("-", col("stream"), col("p")).as("part_name"))
      Control.taskCountEstimate(universe,
          perPartition.unionByName(topicLevel),
          capacityMBps = 4, utilizationPct = 90, defaultKbRate = 5)
        .select(col("stream"), col("n_partitions"), col("total_kb_rate"),
          col("task_count"))
    }),

    // A8: consumer-offset lag — latest vs committed offset per
    // (topic, partition); committed = high-water mark at the cutoff.
    "q29_offset_lag" -> ((s, d) =>
      kafkaShaped(t(s, d, "events"))
        .groupBy(col("topic"), col("partition"))
        .agg(
          max(col("offset")).as("latest"),
          coalesce(
            max(when(col("ts") < to_timestamp(lit("2024-01-08 00:00:00")),
              col("offset"))), lit(-1L)).as("committed"))
        .withColumn("lag", col("latest") - col("committed"))),

    // A2: periodic offset-commit log — committed offset per
    // (partition, commit interval).
    "q30_commit_log" -> ((s, d) =>
      kafkaShaped(t(s, d, "events"))
        .groupBy(col("partition"),
          date_trunc("hour", col("ts")).as("commit_window"))
        .agg(max(col("offset")).as("committed_offset"), count(lit(1)).as("n"))),

    // T7/§7.3(2): CDC materialization — collapse the change log to its
    // final state (last writer per key by scn; DELETE drops the key).
    "q31_cdc_apply" -> ((s, d) =>
      graft.streaming.CdcMerge.latestState(
        t(s, d, "events").select(
          col("user_id").as("key"),
          col("event_id").as("scn"),
          Translate.opcodeOf(col("event_type")).as("opcode"),
          col("props").as("value")),
        keyCols = Seq("key"), scnCol = "scn", opcodeCol = "opcode")),

    // Skew mitigation: salted two-phase aggregation over the hot
    // grouping key (identical result to the direct groupBy).
    "q32_salted_agg" -> ((s, d) =>
      Partitioning.saltedAgg(t(s, d, "events"),
          groupKey = col("event_type"), saltSource = col("user_id"), salts = 16,
          partials = Seq(
            (count(lit(1)), "n"),
            (sum(col("value").cast("decimal(18,2)")), "value_sum")))
        .select(col("__k").as("event_type"), col("n"),
          col("value_sum").cast("double").as("value_sum"))),

    // Distributed as-of join: each click sees the latest purchase by
    // the same user at or before its timestamp (union + window sweep,
    // one shuffle, no range-join explosion).
    "q33_asof_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(max(col("event_id")).as("purchase_id"))
      AsOfJoin.latestBefore(clicks, purchases,
          key = "user_id", time = "ts", rightVals = Seq("purchase_id"))
        .select(col("click_id"), col("user_id"), col("ts").as("click_ts"),
          col("purchase_id"))
    }),

    // Forward as-of join: each click sees the EARLIEST purchase by the
    // same user at or after its timestamp (next-event lookup, mirrored
    // union + window sweep).
    "q39_asof_forward" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("user_id"), col("ts"), col("event_id").as("click_id"))
      val purchases = e.filter(col("event_type") === "purchase")
        .groupBy(col("user_id"), col("ts"))
        .agg(min(col("event_id")).as("purchase_id"))
      AsOfJoin.earliestAfter(clicks, purchases,
          key = "user_id", time = "ts", rightVals = Seq("purchase_id"))
        .select(col("click_id"), col("user_id"), col("ts").as("click_ts"),
          col("purchase_id"))
    }),

    // Interval join: every event a clicking user produced in the six
    // hours after the click — bucketized to an equi-join on
    // (user, time-bucket) so the plan is a shuffle/broadcast hash join,
    // never the nested-loop a raw range predicate degenerates to
    // (PlanSpec asserts no BNLJ/cartesian).
    "q40_interval_join" -> ((s, d) => {
      val e = t(s, d, "events")
      val clicks = e.filter(col("event_type") === "click")
        .select(col("event_id"), col("user_id"), col("ts"))
      val all = e.select(col("event_id"), col("user_id"), col("ts"),
        col("event_type"))
      IntervalJoin.intervalJoin(clicks, all, keyCol = "user_id",
          tsCol = "ts", windowMicros = 6L * 3600L * 1000000L)
        .select(col("p_event_id").as("probe_id"),
          col("c_event_id").as("match_id"),
          col("c_event_type").as("match_type"),
          col("gap_us"))
    }),

    // Multi-level rollup aggregate (flag × status → flag → grand
    // total): Spark's rollup compiles to ONE Expand + partial-agg pass
    // over the fact table — all grouping levels share a single scan and
    // shuffle, the shape that holds at 100 TB. Decimal-cast sum keeps
    // the double total order-independent across engines.
    "q41_rollup" -> ((s, d) =>
      t(s, d, "lineitem")
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))),

    // Time-range window frame: per-user rolling 7-day event count and
    // value total at every event — the trailing-window analytics the
    // reference's EWMA meters (A7) approximate, exact here. The RANGE
    // frame runs over epoch-micros within a user partition, so state
    // per task is one user's 7-day tail, never the corpus; the decimal
    // cast keeps the rolling double sum order-independent.
    "q42_rolling_window" -> ((s, d) => {
      val weekUs = 7L * 86400L * 1000000L
      val e = t(s, d, "events").withColumn("us", unix_micros(col("ts")))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"))
        .rangeBetween(-weekUs, 0)
      e.select(col("event_id"), col("user_id"),
        count(lit(1)).over(w).as("n_7d"),
        sum(col("value").cast("decimal(18,6)")).over(w).cast("double")
          .as("value_7d"))
    }),

    // Batch sessionization (gaps-and-islands): a new session starts at
    // the first event or after a >4 h silence; session index = running
    // count of starts. Both windows are partitioned by user — the
    // partitioned-window counterpart of the s06 streaming
    // session_window, for the at-rest event log.
    "q43_sessionize" -> ((s, d) => {
      val gapUs = 4L * 3600L * 1000000L
      val e = t(s, d, "events").withColumn("us", unix_micros(col("ts")))
      val wo = org.apache.spark.sql.expressions.Window
        .partitionBy(col("user_id")).orderBy(col("us"), col("event_id"))
      val prev = lag(col("us"), 1).over(wo)
      val withBreak = e.withColumn("brk",
        when(prev.isNull || col("us") - prev > gapUs, 1L).otherwise(0L))
      withBreak
        .withColumn("session_seq", sum(col("brk")).over(
          wo.rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)))
        .select(col("event_id"), col("user_id"), col("session_seq"),
          col("brk").as("is_start"))
    }),

    // Custom grouping sets (by flag, and independently by status):
    // same one-Expand-pass shape as q41's rollup, but with caller-
    // chosen grouping level combinations.
    "q44_grouping_sets" -> ((s, d) =>
      t(s, d, "lineitem")
        .groupingSets(
          Seq(Seq(col("l_returnflag")), Seq(col("l_linestatus"))),
          col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_extendedprice").cast("decimal(18,2)")).cast("double")
            .as("sum_price"))),

    // Cube: all four grouping levels (flag × status, flag, status,
    // grand total) — completes the q41/q44 multi-level-aggregate
    // family; still one Expand pass over one scan.
    "q47_cube" -> ((s, d) =>
      t(s, d, "lineitem")
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          count(lit(1)).as("n"),
          sum(col("l_quantity").cast("decimal(18,2)")).cast("double")
            .as("sum_qty"))),

    // JSON ser/de surface (§2.9): decode the JSON payload with a
    // schema (from_json — codegen'd, stays in the scan stage) and
    // re-serialize the checkpoint struct exactly the way the
    // reference persists checkpoints as JSON (JsonUtils via
    // ZookeeperCheckpointProvider.java:100-104).
    "q46_json_payload" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").cast("long").as("k"),
        to_json(struct(
          col("event_type").as("topic"),
          pmod(col("user_id"), lit(8L)).as("partition"),
          col("event_id").as("offset"))).as("checkpoint_json"))),

    // Set operations as data-plane ops (intersect/except/union — the
    // reference only uses them control-plane, D2/D3; the engine
    // exposes them over record streams): cohort membership of users
    // by click/purchase behavior. Both compile to aggregate/join
    // shapes on the key — no row ever crosses the shuffle twice.
    "q45_set_ops" -> ((s, d) => {
      val e = t(s, d, "events")
      def users(kind: String) =
        e.filter(col("event_type") === kind).select(col("user_id")).distinct()
      val clicks = users("click")
      val purchases = users("purchase")
      clicks.intersect(purchases).withColumn("cohort", lit("click_and_purchase"))
        .unionByName(
          clicks.except(purchases).withColumn("cohort", lit("click_only")))
        .select(col("cohort"), col("user_id"))
    }),

    // Skew mitigation for joins: the hot fact key is salted and the
    // small build side replicated per salt — result identical to the
    // plain join (verified by the oracle), shuffle spread over salts.
    "q34_salted_join" -> ((s, d) => {
      val events = t(s, d, "events")
      val dim = events.select(col("event_type")).distinct()
        .withColumn("opcode", Translate.opcodeOf(col("event_type")))
      Partitioning.saltedJoin(events, dim, "event_type",
          saltSource = col("user_id"), salts = 8)
        .groupBy(col("opcode"))
        .agg(count(lit(1)).as("n"), max(col("event_id")).as("max_id"))
    }),

    // O2/P4 stickiness: tasks keep their previous instance on
    // rebalance; only newly-appeared tasks are dealt round-robin.
    "q35_sticky_assign" -> ((s, d) => {
      val tasks = kafkaShaped(t(s, d, "events"))
        .select(concat_ws("-", col("topic"), col("partition")).as("task"))
        .distinct()
      // previous assignment covered only partitions 0-5
      val previous = tasks
        .filter(substring_index(col("task"), "-", -1).cast("long") < 6)
        .withColumn("instance", pmod(Portable.hash64(col("task")), lit(4L)))
      Control.stickyAssign(tasks, previous, "task", "instance", numInstances = 4)
    }),

    // T6 wire form: BINARY registry envelope — MAGIC(0x00) ‖
    // md5(schemaId) raw bytes ‖ payload. A tampered subset (bad magic
    // on every 10th event) must fail validation and decode to null —
    // the F6 skip signal. Reference: AvroMessageEncoderUtil.java:33-76.
    "q36_registry_binary" -> ((s, d) => {
      val schemaId = lit(7L)
      val badFrame = concat(lit(Array[Byte](1)),
        unhex(md5(schemaId.cast("string"))), col("props").cast("binary"))
      t(s, d, "events").filter(col("event_id") < 2000)
        .select(col("event_id"),
          when(pmod(col("event_id"), lit(10L)) === 0, badFrame)
            .otherwise(Portable.registryFrame(schemaId, col("props")))
            .as("frame"))
        .withColumn("payload", Portable.registryUnframe(col("frame"), schemaId))
        .withColumn("ok", col("payload").isNotNull)
        // gate projection: binary cells aren't sortable by the
        // comparison harness, so the wire bytes surface as hex; the
        // frame/unframe exercise above stays fully binary.
        .select(col("event_id"),
          lower(hex(col("frame"))).as("frame_hex"),
          lower(hex(col("payload"))).as("payload_hex"),
          col("ok"))
    }),

    // T6 DYNAMIC schema lookup: one frame column carries TWO writer
    // schemas (v1 = {payload}, v2 = {payload, sender}); the decoder
    // resolves each row's schema from the md5 digest embedded in its
    // own frame — no known schema id — then Avro-decodes with the
    // resolved schema. A bad-magic subset and an unregistered-digest
    // subset must both skip (null schema/fields). The oracle needs no
    // Avro: decode(encode(x)) == x, so expected values come straight
    // from the source columns. Reference: SchemaRegistryClient.java +
    // AvroMessageEncoderUtil.java:58-76.
    "q38_registry_mixed" -> ((s, d) => {
      val v1Json = AvroSerde.stringRecordSchema("EventV1", Seq("payload"))
      val v2Json = AvroSerde.stringRecordSchema("EventV2", Seq("payload", "sender"))
      val registry = SchemaRegistry.empty
        .withSchema("7", v1Json, Seq("payload"))
        .withSchema("9", v2Json, Seq("payload", "sender"))
      val ev = t(s, d, "events").filter(col("event_id") < 2000)
        .select(col("event_id"),
          col("props").as("payload"),
          col("user_id").cast("string").as("sender"))
      // even ids were produced by the v1 writer, odd ids by v2 — the
      // mid-migration mixed topic
      val enc1 = AvroSerde.encode(
        ev.filter(pmod(col("event_id"), lit(2L)) === 0), v1Json,
        Seq("payload"), "avro").withColumn("sid", lit("7"))
      val enc2 = AvroSerde.encode(
        ev.filter(pmod(col("event_id"), lit(2L)) === 1), v2Json,
        Seq("payload", "sender"), "avro").withColumn("sid", lit("9"))
      val framed = enc1.unionByName(enc2).select(
        col("event_id"),
        when(pmod(col("event_id"), lit(10L)).isin(3L, 4L),
          // tampered magic byte (one even + one odd residue)
          concat(lit(Array[Byte](1)), unhex(md5(col("sid"))),
            col("avro")))
          .when(pmod(col("event_id"), lit(10L)).isin(6L, 7L),
            // well-formed frame, but schema id 13 was never registered
            Portable.registryFrame(lit("13"), col("avro")))
          .otherwise(Portable.registryFrame(col("sid"), col("avro")))
          .as("frame"))
      AvroSerde.registryDecode(framed, registry, "frame").select(
        col("event_id"),
        col("schema_id"),
        element_at(col("dec"), "payload").as("dec_payload"),
        element_at(col("dec"), "sender").as("dec_sender"),
        col("schema_id").isNotNull.as("ok"))
    }),

    // Star-schema join rollup: broadcast dims, exact decimal revenue.
    "q21_revenue_by_nation" -> ((s, d) => {
      val orders = t(s, d, "orders")
      val customer = t(s, d, "customer")
      val nation = broadcast(t(s, d, "nation"))
      val region = broadcast(t(s, d, "region"))
      orders.join(customer, col("o_custkey") === col("c_custkey"))
        .join(nation, col("c_nationkey") === col("n_nationkey"))
        .join(region, col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name"), col("n_name"))
        .agg(
          count(lit(1)).as("n_orders"),
          sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    }),

    // K1: the Kafka sink row contract end-to-end — mirror translate →
    // the exact writer schema (topic/key/value/partition/headers,
    // KafkaTransportProvider.convertToProducerRecord:107-146), hex-
    // projected so the byte-level content (UTF-8 key/value encoding,
    // header passthrough of origin coordinates + checkpoint) is
    // hash-comparable against the oracle computing the same bytes.
    "q51_sink_contract" -> ((s, d) =>
      Translate.toKafkaSink(
          Translate.mirror(kafkaShaped(t(s, d, "events")), "mirror.%s", "p-"))
        .select(
          col("topic"),
          col("partition").cast("long").as("partition"),
          lower(hex(col("key"))).as("key_hex"),
          lower(hex(col("value"))).as("value_hex"),
          concat_ws(",", transform(col("headers"), hd =>
            concat(hd.getField("key"), lit("="),
              lower(hex(hd.getField("value")))))).as("headers_hex"))),

    // A4/A5: auto-pause/resume flow control as a checkpointable
    // stateful operator (FlowControl.autoPause, here exercised through
    // Spark's batch execution of flatMapGroupsWithState). Signals are
    // a deterministic send/ack interleaving: each record sends weight
    // w at seq 2r and acks -w at seq 2(r+8)+1, so in-flight is the
    // sliding sum of the last ≤8 sends — never negative (the max(0,·)
    // clamp is provably inert) — and the pause latch (pause above
    // 4500 or on error, resume at ≤3500) has the closed form "last
    // decisive signal wins", which is what the SQL oracle computes.
    // Reference: PausedSourcePartitionMetadata reasons + thresholds
    // KafkaMirrorMakerConnectorTask.java:96-97, 316-333.
    "q52_flow_control" -> ((s, d) => {
      import s.implicits._
      import org.apache.spark.sql.expressions.Window
      val part = concat_ws("-", col("event_type"), pmod(col("user_id"), lit(8L)))
      val ranked = t(s, d, "events").select(
        part.as("partition"),
        (pmod(col("event_id"), lit(997L)) + 1L).as("w"),
        (pmod(col("event_id"), lit(101L)) === 0L).as("err"),
        row_number().over(
          Window.partitionBy(part).orderBy(col("event_id"))).cast("long").as("rn"))
      // One generator pass emits the send AND its delayed ack — one
      // corpus scan and one window shuffle, instead of two of each
      // from a self-union.
      val signals = ranked.select(col("partition"), explode(array(
          struct(col("w").as("delta"), col("err").as("error"),
            (col("rn") * 2L).as("seq")),
          struct((-col("w")).as("delta"), lit(false).as("error"),
            ((col("rn") + 8L) * 2L + 1L).as("seq")))).as("sig"))
        .select(col("partition"), col("sig.delta").as("delta"),
          col("sig.error").as("error"), col("sig.seq").as("seq"))
      graft.streaming.FlowControl.autoPause(
          signals.as[graft.streaming.FlowControl.PartitionSignal],
          maxInFlight = 4500L, minInFlight = 3500L)
        .toDF().select(col("partition"), col("action"),
          col("inFlight").as("in_flight"))
    }),

    // D4: task-lock single ownership — first acquire attempt per
    // (task, lease hour) wins, in attempt-sequence order.
    "q53_task_lock" -> ((s, d) =>
      Control.lockOwners(t(s, d, "events"),
        task = concat_ws("-", col("event_type"), pmod(col("user_id"), lit(8L))),
        instance = col("user_id"),
        seq = col("event_id"),
        lease = date_trunc("hour", col("ts")))),

    // K5: directory sink — apply a create/modify/delete change stream
    // to its final materialized directory state (last change per path
    // wins; a trailing delete removes the entry). Paths collide via
    // doc_id mod 500 so each file sees a real change history.
    // Reference: DirectoryTransportProvider (datastream-directory) —
    // the sink replays DirectoryChangeProcessor events onto the
    // destination tree; the final listing is this query's result.
    "q54_dir_sink_state" -> ((s, d) => {
      val m = pmod(col("doc_id"), lit(3L))
      val changes = t(s, d, "documents").select(
        concat(lit("/data/"), col("source"), lit("/"),
          pmod(col("doc_id"), lit(500L)), lit(".txt")).as("path"),
        when(m === 0, lit("ENTRY_CREATE"))
          .when(m === 1, lit("ENTRY_MODIFY"))
          .otherwise(lit("ENTRY_DELETE")).as("kind"),
        col("doc_id").as("seq"))
      changes.groupBy(col("path"))
        .agg(
          max_by(col("kind"), col("seq")).as("last_kind"),
          max(col("seq")).as("last_seq"),
          count(lit(1)).as("n_changes"))
        .filter(col("last_kind") =!= "ENTRY_DELETE")
    }),

    // K7: destination-topic provisioning — partition-count hierarchy
    // (explicit destination > source partitions > default 1) plus the
    // default topic configs. 'view'/'purchase'/'signup' carry an
    // explicit BYOT destination partition count, 'error' has neither
    // (exercising the default tier), the rest resolve from source.
    "q55_topic_provision" -> ((s, d) => {
      val specs = t(s, d, "events")
        .groupBy(col("event_type").as("topic"))
        .agg(countDistinct(pmod(col("user_id"), lit(8L))).as("observed_partitions"))
        .withColumn("dest_partitions",
          when(length(col("topic")) % 2 === 0, lit(16L)).otherwise(lit(null).cast("long")))
        .withColumn("source_partitions",
          when(col("topic") === "error", lit(null).cast("long"))
            .otherwise(col("observed_partitions")))
      Control.provisionDestinations(specs,
        topicCol = concat(lit("mirror.p-"), col("topic")),
        destPartitions = col("dest_partitions"),
        sourcePartitions = col("source_partitions"))
    }),

    // T7 audit view: the change log expanded to SCD2-style validity
    // intervals — every superseded image queryable, a trailing DELETE
    // leaves the key with no current row (q31 is the latest-state
    // collapse of the same log).
    "q56_cdc_history" -> ((s, d) =>
      graft.streaming.CdcMerge.changeHistory(
        t(s, d, "events").select(
          col("user_id").as("key"),
          col("event_id").as("scn"),
          Translate.opcodeOf(col("event_type")).as("opcode"),
          col("props").as("value")),
        keyCols = Seq("key"), scnCol = "scn", opcodeCol = "opcode")),

    // Seek-to-start-position hierarchy: committed checkpoint (+1) >
    // configured per-partition start > reset strategy. Partitions 0-2
    // simulate fresh assignment (commit masked), partitions ≤1 carry a
    // configured start, and the strategy is latest for even-length
    // topics — so every tier is exercised across the 40 partitions.
    "q57_start_position" -> ((s, d) => {
      val hw = kafkaShaped(t(s, d, "events"))
        .groupBy(col("topic"), col("partition"))
        .agg(
          min(col("offset")).as("earliest"),
          (max(col("offset")) + 1L).as("latest"),
          max(when(col("ts") < to_timestamp(lit("2024-01-08 00:00:00")),
            col("offset"))).as("committed_raw"))
        .withColumn("committed",
          when(col("partition") >= 3, col("committed_raw")))
        .drop("committed_raw")
      Control.startPositions(hw,
        committed = col("committed"),
        configured = when(col("partition") <= 1, col("partition") * 1000L),
        useLatest = length(col("topic")) % 2 === 0)
    }),

    // Broadcast assignment: per-stream task counts (metadata override
    // for click/purchase, one-per-instance default for the rest) dealt
    // round-robin over a 5-instance ring with the position carrying
    // across streams.
    "q58_broadcast_assign" -> ((s, d) =>
      Control.broadcastAssign(
        t(s, d, "events").select(col("event_type").as("stream")).distinct(),
        streamCol = col("stream"),
        numTasksCol = when(col("stream") === "click", 7L)
          .when(col("stream") === "purchase", 2L).otherwise(5L),
        instances = (0 until 5).map(i => s"i$i"))),

    // Load-balancing strategy task sizing: numTasks =
    // min(#partitions, max(#instances × overPartitioning, minTasks))
    // — the cap is raised to at least minTasks, then the PARTITION
    // clamp applies LAST (a stream never gets more tasks than
    // partitions), then the same even dealing as q58. Partition count
    // stands in as the topic-name length (4..8); with a configured
    // overPartitioning = 1 and minTasks = 6 the cap is max(5×1, 6) =
    // 6, so 'purchase' (8) clamps to 6 while 'view' (4) keeps its 4 —
    // both formula branches fire.
    // Reference: LoadbalancingStrategy.java:75
    // (maxTasksPerDatastream = max(instances × over, minTasks)) and
    // :140 (tasksPerDatastream = min(maxTasks, partitions)).
    "q59_loadbalance_assign" -> ((s, d) =>
      Control.broadcastAssign(
        t(s, d, "events").select(col("event_type").as("stream")).distinct(),
        streamCol = col("stream"),
        numTasksCol = least(length(col("stream")).cast("long"),
          greatest(lit(5L * 1), lit(6L))),
        instances = (0 until 5).map(i => s"i$i"))))

  private val h = Portable.hash64Sql _

  val oracles: Map[String, String] = Map(
    "q01_flow_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(length(props)) AS BIGINT) AS bytes,
        |MIN(event_id) AS min_id, MAX(event_id) AS max_id
        |FROM events GROUP BY event_type""".stripMargin.replace("\n", " "),

    "q02_mirror_translate" ->
      s"""SELECT key, value, topic AS origin_topic,
         |partition AS origin_partition, "offset" AS origin_offset,
         |ts AS event_timestamp,
         |CONCAT('mirror.', 'p-', topic) AS dest_topic,
         |CONCAT_WS('-', topic, partition, "offset") AS checkpoint,
         |partition AS dest_partition
         |FROM ($kafkaShapedSql)""".stripMargin.replace("\n", " "),

    "q03_hash_shard" ->
      s"""SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem
         |WHERE MOD(${h("CONCAT_WS('|', l_orderkey, l_linenumber)")}, 8) IN (0, 3)"""
        .stripMargin.replace("\n", " "),

    "q04_seek_chunk" ->
      """SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem
        |WHERE (l_orderkey > 1000) OR (l_orderkey = 1000 AND l_linenumber > 2)
        |ORDER BY l_orderkey, l_linenumber LIMIT 500""".stripMargin.replace("\n", " "),

    // The oracle computes the typed projection straight from parquet —
    // matching it proves the Derby round-trip (DECIMAL/TIMESTAMP/BLOB
    // columns written, chunk-read in 4 shards, projected) is lossless
    // and the type mapping is the deliberate reference one.
    "q49_cdc_typed" ->
      """SELECT o_orderkey,
        |CAST(CAST(o_totalprice AS DECIMAL(12,2)) AS VARCHAR) AS price_str,
        |epoch_ms(o_orderdate) AS order_ts_ms,
        |lower(hex(encode(o_orderstatus))) AS status_hex,
        |o_orderpriority AS priority
        |FROM orders WHERE o_orderkey <= 1000""".stripMargin.replace("\n", " "),

    "q05_topk" ->
      """SELECT o_orderkey, o_totalprice FROM orders
        |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin.replace("\n", " "),

    "q06_paging" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |ORDER BY o_orderkey LIMIT 100 OFFSET 200""".stripMargin.replace("\n", " "),

    "q07_dest_reuse" ->
      """SELECT d.doc_id, d.source, c.canonical_id FROM documents d
        |JOIN (SELECT source, MIN(doc_id) AS canonical_id FROM documents
        |GROUP BY source) c USING (source)""".stripMargin.replace("\n", " "),

    "q08_assignment_diff" ->
      """SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |WHERE event_type = 'click'
        |EXCEPT SELECT DISTINCT user_id, date_trunc('day', ts) AS day FROM events
        |WHERE event_type = 'purchase'""".stripMargin.replace("\n", " "),

    "q09_broadcast_fanout" ->
      """SELECT event_id, g.range AS dest_partition FROM events
        |CROSS JOIN range(0, 4) g WHERE event_id < 100""".stripMargin.replace("\n", " "),

    "q10_safe_checkpoints" ->
      """SELECT MOD(user_id, 8) AS part,
        |COALESCE(MIN(CASE WHEN NOT (value < 30.0) THEN event_id END) - 1,
        |MAX(CASE WHEN value < 30.0 THEN event_id END)) AS safe_checkpoint
        |FROM events GROUP BY 1""".stripMargin.replace("\n", " "),

    "q37_safe_checkpoints_nc" ->
      """WITH k AS (SELECT MOD(user_id, 8) AS partition, event_id AS seq,
        |CONCAT('o-', md5(CAST(event_id AS VARCHAR))) AS tok,
        |(value < 30.0) AS acked FROM events),
        |mu AS (SELECT partition,
        |MIN(CASE WHEN NOT acked THEN seq END) AS first_unacked
        |FROM k GROUP BY 1)
        |SELECT k.partition, max_by(k.tok, k.seq) AS safe_checkpoint
        |FROM k JOIN mu ON k.partition = mu.partition
        |WHERE k.acked AND (mu.first_unacked IS NULL OR k.seq < mu.first_unacked)
        |GROUP BY 1""".stripMargin.replace("\n", " "),

    "q11_sla_windows" ->
      """SELECT date_trunc('hour', ts) AS win, COUNT(*) AS events,
        |CAST(SUM(CASE WHEN value * 1000 <= 60000 THEN 1 ELSE 0 END) AS BIGINT) AS within_sla,
        |CAST(SUM(CASE WHEN value * 1000 > 60000 THEN 1 ELSE 0 END) AS BIGINT) AS outside_sla,
        |CAST(SUM(CASE WHEN value * 1000 > 180000 THEN 1 ELSE 0 END) AS BIGINT) AS outside_alt_sla
        |FROM events GROUP BY 1""".stripMargin.replace("\n", " "),

    "q12_throughput" ->
      """SELECT date_trunc('hour', ts) AS win, event_type AS route,
        |COUNT(*) AS events, CAST(SUM(length(props)) AS BIGINT) AS bytes
        |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "q13_diag_reduce" ->
      """SELECT status, COUNT(*) AS hosts, CAST(SUM(n) AS BIGINT) AS records,
        |CAST(SUM(metric_sum) AS BIGINT) AS metric_total FROM (
        |SELECT CONCAT('host-', CAST(MOD(user_id, 16) AS VARCHAR)) AS host,
        |CASE WHEN event_type IN ('create','insert','signup') THEN 'INSERT'
        |WHEN event_type IN ('delete','drop','error') THEN 'DELETE'
        |ELSE 'UPDATE' END AS status,
        |COUNT(*) AS n, CAST(SUM(event_id) AS BIGINT) AS metric_sum
        |FROM events GROUP BY 1, 2) GROUP BY status""".stripMargin.replace("\n", " "),

    "q14_scalar_funcs" ->
      """SELECT event_id, md5(props) AS md5_hex,
        |CONCAT('dest-', event_type, '-', CAST(MOD(user_id, 4) AS VARCHAR)) AS dest,
        |strftime(ts, '%Y%m%d%H%M%S') AS ts_code,
        |json_extract_string(props, '$.k') AS k_val,
        |regexp_matches(event_type, '^(click|view)$') AS is_click_view
        |FROM events WHERE event_id < 50""".stripMargin.replace("\n", " "),

    "q15_registry_frame" ->
      s"""SELECT event_id,
         |${Portable.registryFrameHexSql("user_id", "props")} AS framed_hex
         |FROM events WHERE event_id < 1000""".stripMargin.replace("\n", " "),

    "q16_cdc_opcodes" ->
      """SELECT CASE WHEN event_type IN ('create','insert','signup') THEN 'INSERT'
        |WHEN event_type IN ('delete','drop','error') THEN 'DELETE'
        |ELSE 'UPDATE' END AS opcode, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
        |FROM events GROUP BY 1""".stripMargin.replace("\n", " "),

    "q17_ttl_filter" ->
      """SELECT event_type, COUNT(*) AS n, MAX(event_id) AS max_id FROM events
        |WHERE ts < TIMESTAMP '2024-01-08 00:00:00' GROUP BY event_type"""
        .stripMargin.replace("\n", " "),

    "q18_file_lines" ->
      """SELECT CAST(doc_id AS VARCHAR) AS key, text AS value,
        |CAST(length(text) AS BIGINT) AS value_len,
        |TIMESTAMP '2024-01-01 00:00:00' AS event_timestamp
        |FROM documents""".stripMargin.replace("\n", " "),

    "q19_topic_whitelist" ->
      """SELECT event_type AS topic, COUNT(*) AS n FROM events
        |WHERE regexp_matches(event_type, '^(click|view)$') GROUP BY 1"""
        .stripMargin.replace("\n", " "),

    "q20_key_partition" ->
      s"""SELECT MOD(${h("CAST(user_id AS VARCHAR)")}, 16) AS part,
         |COUNT(*) AS n FROM events GROUP BY 1""".stripMargin.replace("\n", " "),

    "q22_paused_filter" -> {
      val pausedIn = PausedSet.map(p => s"'$p'").mkString(", ")
      s"""SELECT topic, partition, COUNT(*) AS n, MAX("offset") AS max_offset
         |FROM ($kafkaShapedSql)
         |WHERE CONCAT_WS('-', topic, partition) NOT IN ($pausedIn)
         |GROUP BY 1, 2""".stripMargin.replace("\n", " ")
    },

    "q23_serde_skip" ->
      """WITH f AS (SELECT event_type AS topic,
        |CONCAT(CASE WHEN MOD(event_id, 7) = 0 THEN 'ff' ELSE '00' END,
        |md5(CAST(user_id AS VARCHAR)), lower(hex(CAST(props AS BLOB)))) AS frame
        |FROM events)
        |SELECT topic,
        |CAST(SUM(CASE WHEN SUBSTR(frame, 1, 2) = '00' THEN 1 ELSE 0 END) AS BIGINT) AS delivered,
        |CAST(SUM(CASE WHEN SUBSTR(frame, 1, 2) <> '00' THEN 1 ELSE 0 END) AS BIGINT) AS skipped
        |FROM f GROUP BY 1""".stripMargin.replace("\n", " "),

    "q24_byot_conflict" ->
      """SELECT source, COUNT(*) AS n_conflicts FROM documents p
        |WHERE doc_id >= 250 AND EXISTS (SELECT 1 FROM documents e
        |WHERE e.doc_id < 250 AND e.source = p.source)
        |GROUP BY source""".stripMargin.replace("\n", " "),

    "q25_single_topic_translate" ->
      """SELECT event_id, MOD(event_id, 2) AS timestamp_type,
        |CASE WHEN MOD(event_id, 2) = 1 THEN ts
        |ELSE TIMESTAMP '2024-02-01 00:00:00' END AS source_timestamp
        |FROM events""".stripMargin.replace("\n", " "),

    "q26_dir_events" ->
      """SELECT CONCAT('/data/', source, '/', CAST(doc_id AS VARCHAR), '.txt') AS key,
        |CASE WHEN MOD(doc_id, 3) = 0 THEN 'ENTRY_CREATE'
        |WHEN MOD(doc_id, 3) = 1 THEN 'ENTRY_MODIFY'
        |ELSE 'ENTRY_DELETE' END AS value
        |FROM documents""".stripMargin.replace("\n", " "),

    "q27_load_packing" -> loadPackSql,

    "q28_min_load_task" ->
      s"""SELECT task, COUNT(*) AS n_parts, CAST(SUM(bytes_rate) AS BIGINT) AS load
         |FROM ($loadPackSql) GROUP BY task
         |ORDER BY load, task LIMIT 1""".stripMargin.replace("\n", " "),

    // Estimate-then-pack: the q48 estimator (1 MBps / 50% capacity so
    // the count is non-trivial at the gate scale) feeding the q27
    // round-robin packing, replayed relationally.
    "q50_elastic_pack" ->
      s"""WITH pr AS (SELECT * FROM ($partitionRatesSql) WHERE topic = 'click'),
         |est AS (SELECT CAST(GREATEST(1, LEAST(COUNT(*),
         |CEIL(CAST(SUM(bytes_rate // 1024) AS DOUBLE)
         |/ (1 * 1024 * (50 / 100.0))))) AS BIGINT) AS task_count FROM pr),
         |ranked AS (SELECT topic, partition, bytes_rate,
         |ROW_NUMBER() OVER (ORDER BY bytes_rate DESC, topic, partition) AS rank
         |FROM pr)
         |SELECT topic, partition, bytes_rate, rank, task_count,
         |MOD(rank - 1, task_count) AS task
         |FROM ranked CROSS JOIN est""".stripMargin.replace("\n", " "),

    // The divisor is written 4 * 1024 * (90 / 100.0) — int-over-double
    // division, the same IEEE double the Scala side computes — so the
    // ceil boundary is bit-identical across engines.
    "q48_task_count" ->
      s"""WITH pr AS ($partitionRatesSql),
         |pp AS (SELECT topic || '-' || CAST(partition AS VARCHAR) AS name,
         |bytes_rate // 1024 AS kb_rate FROM pr WHERE partition <= 5),
         |tl AS (SELECT topic AS name,
         |(SUM(bytes_rate) // COUNT(*)) // 1024 AS kb_rate
         |FROM pr WHERE topic IN ('click', 'purchase') GROUP BY 1),
         |rates AS (SELECT * FROM pp UNION ALL SELECT * FROM tl),
         |u AS (SELECT t.topic AS stream,
         |t.topic || '-' || CAST(r.range AS VARCHAR) AS part_name
         |FROM (SELECT DISTINCT topic FROM pr) t CROSS JOIN range(0, 10) r),
         |k AS (SELECT u.stream,
         |COALESCE(p.kb_rate, tt.kb_rate, 5) AS kb
         |FROM u LEFT JOIN rates p ON p.name = u.part_name
         |LEFT JOIN rates tt
         |ON tt.name = regexp_replace(u.part_name, '-[^-]*$$', ''))
         |SELECT stream, COUNT(*) AS n_partitions,
         |CAST(SUM(kb) AS BIGINT) AS total_kb_rate,
         |CAST(LEAST(COUNT(*), CEIL(CAST(SUM(kb) AS DOUBLE)
         |/ (4 * 1024 * (90 / 100.0)))) AS BIGINT) AS task_count
         |FROM k GROUP BY 1""".stripMargin.replace("\n", " "),

    "q29_offset_lag" ->
      s"""SELECT topic, partition, MAX("offset") AS latest,
         |COALESCE(MAX(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
         |THEN "offset" END), -1) AS committed,
         |MAX("offset") - COALESCE(MAX(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
         |THEN "offset" END), -1) AS lag
         |FROM ($kafkaShapedSql) GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "q30_commit_log" ->
      s"""SELECT partition, date_trunc('hour', ts) AS commit_window,
         |MAX("offset") AS committed_offset, COUNT(*) AS n
         |FROM ($kafkaShapedSql) GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "q31_cdc_apply" ->
      """SELECT key, scn, opcode, value FROM (
        |SELECT user_id AS key, event_id AS scn,
        |CASE WHEN event_type IN ('create','insert','signup') THEN 'INSERT'
        |WHEN event_type IN ('delete','drop','error') THEN 'DELETE'
        |ELSE 'UPDATE' END AS opcode, props AS value,
        |ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY event_id DESC) AS rn
        |FROM events)
        |WHERE rn = 1 AND opcode <> 'DELETE'""".stripMargin.replace("\n", " "),

    "q32_salted_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_sum
        |FROM events GROUP BY event_type""".stripMargin.replace("\n", " "),

    "q33_asof_join" ->
      """WITH clicks AS (SELECT user_id, ts, event_id AS click_id
        |FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, ts, MAX(event_id) AS purchase_id
        |FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.click_id, c.user_id, c.ts AS click_ts, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |ON c.user_id = p.user_id AND p.ts <= c.ts"""
        .stripMargin.replace("\n", " "),

    "q39_asof_forward" ->
      """WITH clicks AS (SELECT user_id, ts, event_id AS click_id
        |FROM events WHERE event_type = 'click'),
        |purchases AS (SELECT user_id, ts, MIN(event_id) AS purchase_id
        |FROM events WHERE event_type = 'purchase' GROUP BY user_id, ts)
        |SELECT c.click_id, c.user_id, c.ts AS click_ts, p.purchase_id
        |FROM clicks c ASOF LEFT JOIN purchases p
        |ON c.user_id = p.user_id AND p.ts >= c.ts"""
        .stripMargin.replace("\n", " "),

    "q40_interval_join" ->
      """SELECT a.event_id AS probe_id, b.event_id AS match_id,
        |b.event_type AS match_type,
        |date_diff('microsecond', a.ts, b.ts) AS gap_us
        |FROM events a JOIN events b ON a.user_id = b.user_id
        |AND a.event_type = 'click'
        |AND b.ts > a.ts AND b.ts <= a.ts + INTERVAL 6 HOUR"""
        .stripMargin.replace("\n", " "),

    "q41_rollup" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY ROLLUP(l_returnflag, l_linestatus)"""
        .stripMargin.replace("\n", " "),

    "q42_rolling_window" ->
      """SELECT event_id, user_id,
        |COUNT(*) OVER w AS n_7d,
        |CAST(SUM(CAST(value AS DECIMAL(18,6))) OVER w AS DOUBLE) AS value_7d
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
        |RANGE BETWEEN 604800000000 PRECEDING AND CURRENT ROW)"""
        .stripMargin.replace("\n", " "),

    "q43_sessionize" ->
      """WITH g AS (SELECT event_id, user_id, epoch_us(ts) AS us,
        |CASE WHEN lag(epoch_us(ts)) OVER w IS NULL
        |OR epoch_us(ts) - lag(epoch_us(ts)) OVER w > 14400000000
        |THEN 1 ELSE 0 END AS brk
        |FROM events
        |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts), event_id))
        |SELECT event_id, user_id,
        |CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY us, event_id
        |ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |AS session_seq,
        |CAST(brk AS BIGINT) AS is_start FROM g"""
        .stripMargin.replace("\n", " "),

    "q44_grouping_sets" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
        |AS sum_price
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))"""
        .stripMargin.replace("\n", " "),

    "q47_cube" ->
      """SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
        |CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
        |FROM lineitem
        |GROUP BY CUBE(l_returnflag, l_linestatus)"""
        .stripMargin.replace("\n", " "),

    "q46_json_payload" ->
      """SELECT event_id,
        |CAST(json_extract(props, '$.k') AS BIGINT) AS k,
        |CONCAT('{"topic":"', event_type, '","partition":',
        |CAST(MOD(user_id, 8) AS VARCHAR), ',"offset":',
        |CAST(event_id AS VARCHAR), '}') AS checkpoint_json
        |FROM events""".stripMargin.replace("\n", " "),

    "q45_set_ops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'click'),
        |p AS (SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'purchase')
        |SELECT 'click_and_purchase' AS cohort, user_id
        |FROM (SELECT user_id FROM c INTERSECT SELECT user_id FROM p)
        |UNION ALL
        |SELECT 'click_only', user_id
        |FROM (SELECT user_id FROM c EXCEPT SELECT user_id FROM p)"""
        .stripMargin.replace("\n", " "),

    "q34_salted_join" ->
      """SELECT CASE WHEN event_type IN ('create','insert','signup') THEN 'INSERT'
        |WHEN event_type IN ('delete','drop','error') THEN 'DELETE'
        |ELSE 'UPDATE' END AS opcode,
        |COUNT(*) AS n, MAX(event_id) AS max_id
        |FROM events GROUP BY 1""".stripMargin.replace("\n", " "),

    "q35_sticky_assign" ->
      s"""WITH tasks AS (SELECT DISTINCT CONCAT_WS('-', topic, partition) AS task
         |FROM ($kafkaShapedSql)),
         |previous AS (SELECT task,
         |MOD(${h("task")}, 4) AS instance FROM tasks
         |WHERE CAST(string_split(task, '-')[-1] AS BIGINT) < 6),
         |unassigned AS (SELECT t.task,
         |MOD(ROW_NUMBER() OVER (ORDER BY t.task) - 1, 4) AS instance
         |FROM tasks t LEFT JOIN previous p USING (task) WHERE p.instance IS NULL)
         |SELECT task, instance FROM previous
         |UNION ALL SELECT task, instance FROM unassigned"""
        .stripMargin.replace("\n", " "),

    "q36_registry_binary" ->
      s"""WITH f AS (SELECT event_id,
         |CASE WHEN MOD(event_id, 10) = 0
         |THEN ('\\x01'::BLOB || unhex(md5(CAST(7 AS VARCHAR))) || CAST(props AS BLOB))
         |ELSE ${Portable.registryFrameSql("7", "props")} END AS frame
         |FROM events WHERE event_id < 2000)
         |SELECT event_id, lower(hex(frame)) AS frame_hex,
         |lower(hex(${Portable.registryUnframeSql("frame", "7")})) AS payload_hex,
         |(${Portable.registryFrameValidSql("frame", "7")}) AS ok
         |FROM f""".stripMargin.replace("\n", " "),

    // Avro round-trips exactly, so the expected decode of a valid frame
    // is the source column itself; the two corrupt residue classes
    // (bad magic 3/4, unregistered digest 6/7) skip to nulls, and the
    // v1 schema has no sender field, so even ids decode sender as null.
    "q38_registry_mixed" ->
      """SELECT event_id,
        |CASE WHEN MOD(event_id, 10) IN (3, 4, 6, 7) THEN NULL
        |WHEN MOD(event_id, 2) = 0 THEN '7' ELSE '9' END AS schema_id,
        |CASE WHEN MOD(event_id, 10) IN (3, 4, 6, 7) THEN NULL
        |ELSE props END AS dec_payload,
        |CASE WHEN MOD(event_id, 10) IN (3, 4, 6, 7) OR MOD(event_id, 2) = 0
        |THEN NULL ELSE CAST(user_id AS VARCHAR) END AS dec_sender,
        |(MOD(event_id, 10) NOT IN (3, 4, 6, 7)) AS ok
        |FROM events WHERE event_id < 2000""".stripMargin.replace("\n", " "),

    "q21_revenue_by_nation" ->
      """SELECT r_name, n_name, COUNT(*) AS n_orders,
        |CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
        |FROM orders JOIN customer ON o_custkey = c_custkey
        |JOIN nation ON c_nationkey = n_nationkey
        |JOIN region ON n_regionkey = r_regionkey
        |GROUP BY r_name, n_name""".stripMargin.replace("\n", " "),

    // The oracle recomputes the sink row bytes (UTF-8 encode + hex)
    // straight from the source columns — matching proves the writer
    // contract carries exactly the right bytes per field.
    "q51_sink_contract" ->
      s"""SELECT CONCAT('mirror.', 'p-', topic) AS topic,
         |partition,
         |lower(hex(encode(key))) AS key_hex,
         |lower(hex(encode(value))) AS value_hex,
         |CONCAT('origin-topic=', lower(hex(encode(topic))),
         |',origin-partition=', lower(hex(encode(CAST(partition AS VARCHAR)))),
         |',origin-offset=', lower(hex(encode(CAST("offset" AS VARCHAR)))),
         |',checkpoint=', lower(hex(encode(CONCAT_WS('-', topic, partition, "offset"))))
         |) AS headers_hex
         |FROM ($kafkaShapedSql)""".stripMargin.replace("\n", " "),

    // Closed form of the pause latch: with send/ack deltas interleaved
    // so prefix sums stay non-negative, the paused state after any
    // prefix equals "the last decisive signal was a pause trigger"
    // (decisive = error/overflow → P, drained-below-min → R; in-between
    // signals leave the latch untouched), and the operator's emitted
    // transitions are exactly where that latch flips.
    "q52_flow_control" ->
      """WITH ranked AS (
        |SELECT CONCAT_WS('-', event_type, MOD(user_id, 8)) AS partition,
        |MOD(event_id, 997) + 1 AS w, (MOD(event_id, 101) = 0) AS err,
        |ROW_NUMBER() OVER (PARTITION BY CONCAT_WS('-', event_type, MOD(user_id, 8))
        |ORDER BY event_id) AS rn FROM events),
        |signals AS (
        |SELECT partition, 2 * rn AS seq, w AS delta, err AS error FROM ranked
        |UNION ALL
        |SELECT partition, 2 * (rn + 8) + 1 AS seq, -w AS delta, FALSE AS error FROM ranked),
        |folded AS (
        |SELECT partition, seq, error,
        |CAST(SUM(delta) OVER (PARTITION BY partition ORDER BY seq) AS BIGINT) AS in_flight
        |FROM signals),
        |classified AS (
        |SELECT partition, seq, in_flight,
        |CASE WHEN error OR in_flight > 4500 THEN 'P'
        |WHEN in_flight <= 3500 THEN 'R' END AS decisive FROM folded),
        |latched AS (
        |SELECT partition, seq, in_flight,
        |COALESCE(LAST_VALUE(decisive IGNORE NULLS) OVER (
        |PARTITION BY partition ORDER BY seq ROWS UNBOUNDED PRECEDING), 'R') = 'P' AS paused
        |FROM classified),
        |transitions AS (
        |SELECT partition, seq, in_flight, paused,
        |COALESCE(LAG(paused) OVER (PARTITION BY partition ORDER BY seq), FALSE) AS prev_paused
        |FROM latched)
        |SELECT partition, CASE WHEN paused THEN 'PAUSE' ELSE 'RESUME' END AS action,
        |in_flight FROM transitions WHERE paused != prev_paused"""
        .stripMargin.replace("\n", " "),

    "q53_task_lock" ->
      """SELECT CONCAT_WS('-', event_type, MOD(user_id, 8)) AS task,
        |date_trunc('hour', ts) AS lease_start,
        |arg_min(user_id, event_id) AS owner,
        |MIN(event_id) AS acquired_at, COUNT(*) AS n_contenders
        |FROM events GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "q54_dir_sink_state" ->
      """WITH changes AS (
        |SELECT CONCAT('/data/', source, '/', MOD(doc_id, 500), '.txt') AS path,
        |CASE MOD(doc_id, 3) WHEN 0 THEN 'ENTRY_CREATE'
        |WHEN 1 THEN 'ENTRY_MODIFY' ELSE 'ENTRY_DELETE' END AS kind,
        |doc_id AS seq FROM documents)
        |SELECT path, arg_max(kind, seq) AS last_kind, MAX(seq) AS last_seq,
        |COUNT(*) AS n_changes FROM changes GROUP BY path
        |HAVING arg_max(kind, seq) != 'ENTRY_DELETE'"""
        .stripMargin.replace("\n", " "),

    "q55_topic_provision" ->
      """WITH specs AS (
        |SELECT event_type AS topic,
        |COUNT(DISTINCT MOD(user_id, 8)) AS observed_partitions
        |FROM events GROUP BY 1)
        |SELECT CONCAT('mirror.p-', topic) AS dest_topic,
        |CAST(COALESCE(
        |CASE WHEN length(topic) % 2 = 0 THEN 16 END,
        |CASE WHEN topic != 'error' THEN observed_partitions END,
        |1) AS BIGINT) AS partitions,
        |1 AS replication_factor,
        |CAST(1209600000 AS BIGINT) AS retention_ms
        |FROM specs""".stripMargin.replace("\n", " "),

    "q56_cdc_history" ->
      """WITH log AS (SELECT user_id AS key, event_id AS scn,
        |CASE WHEN event_type IN ('create','insert','signup') THEN 'INSERT'
        |WHEN event_type IN ('delete','drop','error') THEN 'DELETE'
        |ELSE 'UPDATE' END AS opcode, props AS value FROM events),
        |h AS (SELECT *, COALESCE(LEAD(scn) OVER (
        |PARTITION BY key ORDER BY scn), -1) AS scn_to FROM log)
        |SELECT key, scn, opcode, value, scn_to, scn_to = -1 AS is_current
        |FROM h WHERE opcode <> 'DELETE'""".stripMargin.replace("\n", " "),

    "q57_start_position" ->
      s"""WITH hw AS (
         |SELECT topic, partition, MIN("offset") AS earliest,
         |MAX("offset") + 1 AS latest,
         |MAX(CASE WHEN ts < TIMESTAMP '2024-01-08 00:00:00'
         |THEN "offset" END) AS committed_raw
         |FROM ($kafkaShapedSql) GROUP BY 1, 2)
         |SELECT topic, partition, earliest, latest,
         |CASE WHEN partition >= 3 THEN committed_raw END AS committed,
         |COALESCE(
         |CASE WHEN partition >= 3 THEN committed_raw END + 1,
         |CASE WHEN partition <= 1 THEN partition * 1000 END,
         |CASE WHEN length(topic) % 2 = 0 THEN latest ELSE earliest END
         |) AS start_offset
         |FROM hw""".stripMargin.replace("\n", " "),

    "q58_broadcast_assign" ->
      """WITH sized AS (
        |SELECT DISTINCT event_type AS stream,
        |CASE event_type WHEN 'click' THEN 7 WHEN 'purchase' THEN 2
        |ELSE 5 END AS num_tasks FROM events),
        |tasks AS (SELECT stream, r.range AS task_pos FROM sized
        |CROSS JOIN range(0, 7) r WHERE r.range < num_tasks),
        |dealt AS (SELECT stream, task_pos,
        |ROW_NUMBER() OVER (ORDER BY stream, task_pos) - 1 AS rn FROM tasks)
        |SELECT stream, task_pos, 'i' || CAST(rn % 5 AS VARCHAR) AS instance
        |FROM dealt""".stripMargin.replace("\n", " "),

    "q59_loadbalance_assign" ->
      """WITH sized AS (
        |SELECT DISTINCT event_type AS stream,
        |LEAST(length(event_type), GREATEST(5, 6)) AS num_tasks FROM events),
        |tasks AS (SELECT stream, r.range AS task_pos FROM sized
        |CROSS JOIN range(0, 10) r WHERE r.range < num_tasks),
        |dealt AS (SELECT stream, task_pos,
        |ROW_NUMBER() OVER (ORDER BY stream, task_pos) - 1 AS rn FROM tasks)
        |SELECT stream, task_pos, 'i' || CAST(rn % 5 AS VARCHAR) AS instance
        |FROM dealt""".stripMargin.replace("\n", " "))
}
