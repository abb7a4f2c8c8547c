package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/**
 * Control-plane query-shaped operators: dedup/reuse, set diffs,
 * paging, and the scatter-gather diagnostics reduce.
 */
object Control {

  /**
   * Destination-reuse dedup (D1): among entities sharing a source,
   * elect one canonical destination (the oldest entity's) and have
   * every other entity reuse it — a keyed self-join against the
   * per-source minimum.
   * Reference: SourceBasedDeduper.java:66 + Coordinator.
   * initializeDatastreamDestination :2406-2453.
   *
   * Scale note: the canonical side is a per-key aggregate (small);
   * Spark broadcasts it automatically under AQE.
   */
  def destinationReuse(df: DataFrame, sourceCol: String, idCol: String): DataFrame = {
    val canonical = df.groupBy(col(sourceCol))
      .agg(min(col(idCol)).as("canonical_id"))
    df.join(canonical, sourceCol)
  }

  /**
   * BYOT destination-conflict check (D2): new destinations that
   * intersect existing ones must be rejected — a semi-join.
   * Reference: Coordinator.java:2416-2432.
   */
  def destinationConflicts(newDf: DataFrame, existing: DataFrame, destCol: String): DataFrame =
    newDf.join(existing, Seq(destCol), "left_semi")

  /**
   * Assignment diff (D3): added = new \ old, removed = old \ new.
   * Reference: Coordinator.getRemovedTasks/getAddedTasks :1090-1101.
   */
  def added(newDf: DataFrame, oldDf: DataFrame): DataFrame = newDf.except(oldDf)
  def removed(newDf: DataFrame, oldDf: DataFrame): DataFrame = oldDf.except(newDf)

  /**
   * Paging (O4): `start`/`count` page over a deterministic order.
   * Reference: DatastreamResources.getAll :853-877.
   */
  def page(df: DataFrame, orderKeys: Seq[Column], start: Int, count: Int): DataFrame =
    df.orderBy(orderKeys: _*).offset(start).limit(count)

  /**
   * Load-based partition packing (O3/P4): sort partitions by
   * throughput descending and deal them round-robin across tasks —
   * the deterministic variant of the reference's greedy
   * least-loaded-first assignment (equivalent when partition loads are
   * of similar magnitude, and order-stable so an external oracle can
   * reproduce it).
   * Reference: LoadBasedPartitionAssigner.assignPartitions :80+
   * (sort by bytes-in rate desc :50-52, pick least-loaded task).
   *
   * Scale note: the input is control-plane cardinality (one row per
   * topic-partition, thousands at most), so the single-partition
   * global window is deliberate — this never runs over event data.
   */
  def loadPack(df: DataFrame, rate: Column, tieBreak: Seq[Column], numTasks: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(rate.desc +: tieBreak.map(_.asc): _*)
    df.withColumn("rank", row_number().over(w).cast("long"))
      .withColumn("task", pmod(col("rank") - 1, lit(numTasks.toLong)))
  }

  /**
   * Elastic task-count estimation: how many tasks a datastream NEEDS,
   * derived from per-partition throughput vs per-task capacity — the
   * estimation step that precedes [[loadPack]]'s packing into a given
   * task count.
   * Reference: LoadBasedTaskCountEstimator.java:58-91 (rate lookup
   * falls back partition → topic-level entry → default :74-80; task
   * count = ceil(totalKB / (capacityMBps·1024·utilization)) :85-88,
   * clamped to the partition count :88) and
   * LoadBasedPartitionAssigner.extractTopicFromPartition :346-353
   * (topic = partition name up to the last '-').
   *
   * @param universe the datastreams' full partition sets
   *                 (stream, part_name) — assigned ∪ unassigned
   * @param rates    throughput info (name, kb_rate); entries may be
   *                 partition-level ("topic-3") or topic-level
   *                 ("topic") — a partition missing both takes the
   *                 default rate
   *
   * A stream with an empty partition set yields no output row (the
   * reference returns 0). Control-plane cardinality: two equi left
   * joins (AQE broadcasts the rate table) + one keyed aggregate.
   */
  def taskCountEstimate(universe: DataFrame, rates: DataFrame,
      capacityMBps: Int, utilizationPct: Int, defaultKbRate: Int): DataFrame = {
    val perTaskKb = capacityMBps * 1024 * (utilizationPct / 100.0)
    val perPart = universe
      .withColumn("__topic", regexp_replace(col("part_name"), "-[^-]*$", ""))
      .join(rates.select(col("name").as("part_name"), col("kb_rate").as("__pr")),
        Seq("part_name"), "left")
      .join(rates.select(col("name").as("__topic"), col("kb_rate").as("__tr")),
        Seq("__topic"), "left")
      .withColumn("__kb",
        coalesce(col("__pr"), col("__tr"), lit(defaultKbRate.toLong)))
    perPart.groupBy(col("stream"))
      .agg(count(lit(1)).as("n_partitions"),
        sum(col("__kb")).as("total_kb_rate"))
      .withColumn("task_count",
        least(col("n_partitions"),
          ceil(col("total_kb_rate").cast("double") / perTaskKb)))
  }

  /**
   * Sticky assignment (O2/P4): tasks that already have an instance
   * KEEP it (no movement on rebalance — the reference's stickiness
   * guarantee, StickyMulticastStrategy.java:55-64); only tasks with no
   * current owner are dealt round-robin across instances. A left join
   * against the previous assignment plus one rank over the unassigned
   * remainder — control-plane cardinality, one broadcast-size join.
   */
  def stickyAssign(tasks: DataFrame, previous: DataFrame, taskCol: String,
      instanceCol: String, numInstances: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val joined = tasks.join(previous, Seq(taskCol), "left")
    val kept = joined.filter(col(instanceCol).isNotNull)
    val w = Window.orderBy(col(taskCol))
    val placed = joined.filter(col(instanceCol).isNull)
      .drop(instanceCol)
      .withColumn(instanceCol,
        pmod(row_number().over(w).cast("long") - 1, lit(numInstances.toLong)))
    kept.unionByName(placed.select(kept.columns.map(col): _*))
  }

  /**
   * Diagnostics scatter-gather reduce (A10): per-instance partial
   * status rolled up into one global answer — a two-level aggregation
   * (partial per host, merge at the originator), which is exactly
   * Spark's partial/final agg split, so map-side combine is free.
   * Reference: DiagnosticsAware.java:21-36 +
   * ServerComponentHealthAggregator.java.
   */
  def diagReduce(df: DataFrame, hostCol: Column, statusCol: Column, metric: Column): DataFrame = {
    val perHost = df.groupBy(hostCol.as("host"), statusCol.as("status"))
      .agg(count(lit(1)).as("n"), sum(metric).as("metric_sum"))
    perHost.groupBy(col("status"))
      .agg(
        count(lit(1)).as("hosts"),
        sum(col("n")).as("records"),
        sum(col("metric_sum")).as("metric_total"))
  }

  /**
   * Task-lock ownership (D4): among contending acquire attempts, the
   * FIRST attempt per (task, lease window) wins and every later
   * attempt observes the same owner — the reference serializes this
   * through ZK ephemeral-node creation order, so "first" is defined
   * by the attempt sequence number, not wall-clock ties.
   * Reference: DatastreamTask.acquire/release :126-139 +
   * ZkAdapter.java:123 (lock paths zk/KeyBuilder.java:16-28).
   *
   * Scale note: one shuffle keyed by (task, lease); `min_by` has a
   * map-side partial (one candidate per key per task), so contender
   * cardinality never crosses the wire.
   */
  def lockOwners(df: DataFrame, task: Column, instance: Column,
      seq: Column, lease: Column): DataFrame =
    df.groupBy(task.as("task"), lease.as("lease_start"))
      .agg(
        min_by(instance, seq).as("owner"),
        min(seq).as("acquired_at"),
        count(lit(1)).as("n_contenders"))

  /**
   * Destination-topic provisioning spec (K7): resolve the partition
   * count through the reference's hierarchy — explicit destination
   * partitions if set, else the source's partition count, else the
   * default of 1 — and attach the default topic configs (RF=1,
   * retention.ms=14 days) applied when the creating datastream
   * supplies none.
   * Reference: KafkaTransportProviderAdmin.
   * initializeDestinationForDatastream :214-224 (hierarchy),
   * createTopic :285-311 + getTopic :325-330 (RF default "1"),
   * populateTopicConfig (DEFAULT_RETENTION 14 days :70).
   */
  def provisionDestinations(specs: DataFrame, topicCol: Column,
      destPartitions: Column, sourcePartitions: Column): DataFrame =
    specs.select(
      topicCol.as("dest_topic"),
      coalesce(destPartitions, sourcePartitions, lit(1L)).cast("long").as("partitions"),
      lit(1).as("replication_factor"),
      lit(14L * 24 * 3600 * 1000).as("retention_ms"))

  /**
   * Seek-to-start-position hierarchy: where consumption begins for
   * each source partition. A committed checkpoint wins (resume one
   * past it); a partition with no commit falls to the datastream's
   * configured per-partition start position; with neither, the reset
   * strategy picks the high watermark ("latest") or the low one
   * ("earliest").
   * Reference: AbstractKafkaBasedConnectorTask.seekToStartPosition
   * :769-785 (startOffsets > seekToEnd/seekToBeginning by strategy)
   * + the committed-null branch :753-767;
   * DatastreamMetadataConstants.START_POSITION :103.
   *
   * `partitions` must carry `earliest`/`latest` watermark columns;
   * the three tiers arrive as Columns so callers bind them to
   * checkpoint state, spec metadata, and consumer config
   * respectively. Null propagates through each tier exactly as the
   * reference's absent-commit / absent-config cases do.
   */
  def startPositions(partitions: DataFrame, committed: Column,
      configured: Column, useLatest: Column): DataFrame =
    partitions.withColumn("start_offset",
      coalesce(committed + lit(1L), configured,
        when(useLatest, col("latest")).otherwise(col("earliest"))))

  /**
   * Broadcast assignment strategy: each datastream expands to its own
   * task count (datastream-level maxTasks metadata > strategy config >
   * one per instance — the caller resolves that hierarchy into
   * `numTasksCol`), and ALL tasks are dealt round-robin over the
   * instance ring with a position that CARRIES ACROSS datastreams, so
   * the cluster stays balanced even when task counts aren't multiples
   * of the instance count.
   * Reference: BroadcastStrategy.assign :56-120 (instancePos advances
   * once per task, across groups :91-118; getNumTasks hierarchy
   * :124-139). The ZK task-reuse bookkeeping (:64-90) is checkpoint
   * plumbing Spark's scheduler replaces.
   *
   * Scale note: control-plane cardinality (streams × tasks), so the
   * single global window is deliberate — same stance as [[loadPack]].
   */
  def broadcastAssign(streams: DataFrame, streamCol: Column,
      numTasksCol: Column, instances: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(instances.nonEmpty, "broadcastAssign needs at least one instance")
    val ring = array(instances.map(lit): _*)
    val w = Window.orderBy(col("stream"), col("task_pos"))
    streams.select(streamCol.as("stream"), numTasksCol.as("num_tasks"))
      .withColumn("task_pos",
        explode(sequence(lit(0L), col("num_tasks").cast("long") - 1L)))
      .withColumn("rn", row_number().over(w).cast("long") - 1L)
      .withColumn("instance",
        element_at(ring, pmod(col("rn"), lit(instances.size.toLong)).cast("int") + 1))
      .select(col("stream"), col("task_pos"), col("instance"))
  }
}
