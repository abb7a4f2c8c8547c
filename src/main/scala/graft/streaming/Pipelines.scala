package graft.streaming

import java.util.concurrent.ConcurrentHashMap

import scala.collection.concurrent.TrieMap
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}

import graft.model.{PipelineSpec, PipelineStatus}

/**
 * Thin pipeline manager: the engine's control plane.
 *
 * One datastream spec = one StreamingQuery; the coordinator, ZooKeeper
 * assignment, leader election and checkpoint providers of the reference
 * (Coordinator.java, ZkAdapter.java, ZookeeperCheckpointProvider.java)
 * collapse into the Spark driver + `checkpointLocation` offset/commit
 * logs, per SURVEY.md §3.1/§7.1. What remains is CRUD + validation +
 * destination-reuse dedup (SourceBasedDeduper.java:66) + lifecycle
 * (pause = stop query keeping checkpoints; resume = restart from them —
 * Spark's native replay contract).
 */
/**
 * Pluggable control-plane hooks — the engine's SPI surface (SURVEY.md
 * §2.10): Authorizer (reference: api/security/Authorizer.java, used
 * Coordinator.java:2371-2393), update validation (Connector
 * .validateUpdateDatastreams :86), and post-state-change action
 * (postDatastreamStateChangeAction :163).
 */
final case class PipelineHooks(
    authorize: (PipelineSpec, String) => Boolean = (_, _) => true,
    validateUpdate: (PipelineSpec, PipelineSpec) => Unit = (_, _) => (),
    onStateChange: (String, PipelineStatus.Value) => Unit = (_, _) => ())

final class PipelineManager(spark: SparkSession, checkpointRoot: String,
    hooks: PipelineHooks = PipelineHooks()) {

  private val specs = TrieMap.empty[String, PipelineSpec]
  private val queries = new ConcurrentHashMap[String, StreamingQuery]()
  // F2/A4: admission state — (partition column, paused values) per
  // pipeline; applied by start() on EVERY (re)start so the admission
  // invariant survives pause/resume cycles.
  private val pausedPartitions = TrieMap.empty[String, (String, Set[String])]
  // A6/A7: last observed per-epoch metrics per pipeline (fed by the
  // observe() aggregation through a StreamingQueryListener).
  private val lastMetrics = TrieMap.empty[String, Map[String, Long]]

  private val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
    import org.apache.spark.sql.streaming.StreamingQueryListener._
    override def onQueryStarted(e: QueryStartedEvent): Unit = ()
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val row = e.progress.observedMetrics.get("graft_metrics")
      // only queries owned by THIS manager — several managers can
      // share one session without cross-polluting each other's metrics
      if (row != null && queries.containsKey(e.progress.name)) {
        lastMetrics.put(e.progress.name,
          Map("events" -> row.getAs[Long]("events"),
            "bytes" -> Option(row.getAs[Any]("bytes"))
              .map(_.asInstanceOf[Long]).getOrElse(0L)))
      }
    }
  }
  spark.streams.addListener(listener)

  /** Stop all queries and unregister the listener (managers are
    * session-scoped resources; leaking listeners retains the manager
    * and slows every future progress event). */
  def close(): Unit = {
    queries.values().asScala.foreach(q => if (q.isActive) q.stop())
    queries.clear()
    spark.streams.removeListener(listener)
  }

  /** Validate + authorize + dedup + register (the "create" DDL).
    * Owner is checked by the Authorizer hook before any resource is
    * provisioned (Coordinator.java:2371-2393 ordering). */
  def create(spec: PipelineSpec, owner: String = "anonymous"): PipelineSpec = {
    require(spec.name.nonEmpty, "pipeline name required")
    require(hooks.authorize(spec, owner), s"owner $owner not authorized for ${spec.name}")
    require(!specs.contains(spec.name), s"duplicate pipeline ${spec.name}")
    require(spec.sourceConnection.nonEmpty, "source connection required")
    // BYOT conflict (D2): a user-managed destination may serve one
    // pipeline only (Coordinator.java:2416-2432).
    val byotConflict = spec.destinationConnection.nonEmpty &&
      specs.values.exists(_.destinationConnection == spec.destinationConnection)
    require(!byotConflict, s"destination ${spec.destinationConnection} already in use")
    // Destination-reuse dedup (D1): same source ⇒ share destination.
    val deduped = specs.values.find(_.sourceConnection == spec.sourceConnection) match {
      case Some(existing) if spec.destinationConnection.isEmpty =>
        spec.copy(destinationConnection = existing.destinationConnection)
      case _ if spec.destinationConnection.isEmpty =>
        // auto-provision a destination (the analog of the reference's
        // Coordinator.createTopic): durable sinks get a real path.
        spec.copy(destinationConnection =
          if (spec.transport == "memory") s"dest-${spec.name}"
          else s"$checkpointRoot/dest/${spec.name}")
      case _ => spec
    }
    val ready = deduped.copy(status = PipelineStatus.Ready)
    specs.put(spec.name, ready)
    hooks.onStateChange(spec.name, PipelineStatus.Ready)
    ready
  }

  /**
   * Update a registered spec (the reference's update path,
   * DatastreamResources update :410 → validateUpdateDatastreams).
   * The running query, if any, must be restarted by the caller to pick
   * up the new spec — same restart contract as the reference.
   */
  def update(name: String, newSpec: PipelineSpec,
      owner: String = "anonymous"): PipelineSpec = {
    val existing = specs.getOrElse(name, sys.error(s"unknown pipeline $name"))
    require(newSpec.name == name, "pipeline name is immutable")
    require(newSpec.sourceConnection.nonEmpty, "source connection required")
    // same authorize-before-mutate ordering as create (the reference
    // authorizes every mutating call, Coordinator.java:2371-2393)
    require(hooks.authorize(newSpec, owner),
      s"owner $owner not authorized to update $name")
    hooks.validateUpdate(existing, newSpec)
    val updated = newSpec.copy(status = existing.status,
      destinationConnection =
        if (newSpec.destinationConnection.nonEmpty) newSpec.destinationConnection
        else existing.destinationConnection)
    specs.put(name, updated)
    updated
  }

  def get(name: String): Option[PipelineSpec] = specs.get(name)
  def list(start: Int, count: Int): Seq[PipelineSpec] =
    specs.values.toSeq.sortBy(_.name).slice(start, start + count)

  /**
   * Build the source DataFrame for a spec (batch-testable subset).
   *
   * Flow control (A5): the reference pauses partitions when in-flight
   * exceeds a threshold (KafkaMirrorMakerConnectorTask.java:316-333);
   * Spark's equivalent is per-trigger admission — metadata keys
   * `maxFilesPerTrigger` / `maxOffsetsPerTrigger` bound each
   * micro-batch, which is the same backpressure contract enforced at
   * the source instead of the producer.
   */
  private def source(spec: PipelineSpec): DataFrame = spec.connector match {
    case "rate" =>
      spark.readStream.format("rate")
        .option("rowsPerSecond", spec.sourcePartitions.max(1) * 10).load()
    case "parquet" =>
      val schema = spark.read.parquet(spec.sourceConnection).schema
      val reader = spark.readStream.schema(schema)
      val withFlow = spec.metadata.get("maxFilesPerTrigger")
        .fold(reader)(v => reader.option("maxFilesPerTrigger", v))
      withFlow.parquet(spec.sourceConnection)
    case "kafka" =>
      val reader = spark.readStream.format("kafka")
        .option(
          if (spec.sourceConnection.contains("*") || spec.sourceConnection.contains(".+"))
            "subscribePattern" else "subscribe",
          spec.sourceConnection)
      spec.metadata.get("maxOffsetsPerTrigger")
        .fold(reader)(v => reader.option("maxOffsetsPerTrigger", v)).load()
    case other => throw new IllegalArgumentException(s"unknown connector $other")
  }

  /**
   * Paused-partition admission (F2/A4): records of paused partitions
   * are filtered out before the sink. The reference reconciles its
   * paused set pre-poll (AbstractKafkaBasedConnectorTask
   * .preConsumerPollHook); here the set is recorded and start()
   * applies it on EVERY (re)start — including later pause()/resume()
   * cycles — so the admission invariant cannot be dropped by a
   * restart. Re-admission happens from the checkpoint without
   * replaying delivered records.
   */
  def pausePartitions(name: String, partitionCol: String, values: Set[String],
      transform: DataFrame => DataFrame): StreamingQuery = {
    pausedPartitions.put(name, (partitionCol, values))
    Option(queries.remove(name)).foreach(_.stop())
    start(name, transform)
  }

  /** The admission filter start() applies from the recorded state. */
  private def admission(name: String)(df: DataFrame): DataFrame =
    pausedPartitions.get(name) match {
      case Some((partitionCol, values)) if values.nonEmpty =>
        df.filter(!col(partitionCol).isin(values.toSeq: _*))
      case _ => df
    }

  /**
   * Start the query for a created spec with a transform chain.
   * Checkpointing (the reference's ZookeeperCheckpointProvider) is the
   * built-in offset/commit log under `checkpointRoot/name`.
   */
  def start(name: String, transform: DataFrame => DataFrame,
      trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    val spec = specs.getOrElse(name, sys.error(s"unknown pipeline $name"))
    // A6/A7: per-epoch throughput metrics ride the query itself via
    // observe() — no second pass over the data; the listener above
    // collects them (the reference's EventProducer SLA counters).
    val transformed = admission(name)(transform(source(spec)))
    val out =
      if (transformed.columns.contains("value"))
        transformed.observe("graft_metrics",
          count(lit(1)).as("events"),
          sum(length(col("value").cast("string")).cast("long")).as("bytes"))
      else
        transformed.observe("graft_metrics",
          count(lit(1)).as("events"), max(lit(0L)).as("bytes"))
    val writer = out.writeStream
      .queryName(name)
      .outputMode("append")
      .option("checkpointLocation", s"$checkpointRoot/$name")
      .trigger(trigger)
    // Transport selection (the reference's TransportProvider registry).
    // Note: the memory sink cannot recover from a checkpoint — durable
    // pipelines use parquet (or kafka in a real deployment).
    val q = spec.transport match {
      case "memory" => writer.format("memory").start()
      case "parquet" =>
        writer.format("parquet").option("path", spec.destinationConnection).start()
      case "kafka" =>
        writer.format("kafka").option("topic", spec.destinationConnection).start()
      case "noop" => writer.format("noop").start()
      case "directory" =>
        // K5: directory sink — epoch-batched filesystem application
        // (foreachBatch = the flush barrier of K3: the epoch commits
        // only after the batch lands).
        val dest = spec.destinationConnection
        writer.foreachBatch { (batch: DataFrame, _: Long) =>
          batch.write.mode("append").parquet(dest)
        }.start()
      case "cdc" =>
        // T7 materialization: each epoch's change records upsert into
        // the keyed state table (crash-safe swap in CdcMerge). Key/scn/
        // opcode columns come from spec.metadata (defaults key/scn/
        // opcode) — the downstream contract of the CDC envelope.
        val dest = spec.destinationConnection
        val keyCols = spec.metadata.getOrElse("cdcKeyCols", "key").split(",").toSeq
        val scnCol = spec.metadata.getOrElse("cdcScnCol", "scn")
        val opcodeCol = spec.metadata.getOrElse("cdcOpcodeCol", "opcode")
        val sess = spark
        writer.foreachBatch { (batch: DataFrame, _: Long) =>
          CdcMerge.applyBatch(sess, batch, dest, keyCols, scnCol, opcodeCol)
        }.start()
      case other => throw new IllegalArgumentException(s"unknown transport $other")
    }
    queries.put(name, q)
    q
  }

  /** Last observed per-epoch metrics for a pipeline (A6/A7). */
  def metrics(name: String): Map[String, Long] =
    lastMetrics.getOrElse(name, Map.empty)

  /** Currently paused partitions (F2/A4 diagnostics surface). */
  def paused(name: String): Set[String] =
    pausedPartitions.get(name).map(_._2).getOrElse(Set.empty)

  /** Pause = stop the query; offsets stay in the checkpoint. */
  def pause(name: String): Unit = {
    Option(queries.remove(name)).foreach(_.stop())
    specs.updateWith(name)(_.map(_.copy(status = PipelineStatus.Paused)))
    hooks.onStateChange(name, PipelineStatus.Paused)
  }

  /** Resume = restart from the same checkpointLocation. */
  def resume(name: String, transform: DataFrame => DataFrame): StreamingQuery = {
    specs.updateWith(name)(_.map(_.copy(status = PipelineStatus.Ready)))
    hooks.onStateChange(name, PipelineStatus.Ready)
    start(name, transform)
  }

  def delete(name: String): Unit = {
    Option(queries.remove(name)).foreach(_.stop())
    specs.updateWith(name)(_.map(_.copy(status = PipelineStatus.Deleting)))
    specs.remove(name)
    hooks.onStateChange(name, PipelineStatus.Deleting)
  }

  /**
   * Diagnostics scatter-gather (A10 / DiagnosticsAware.reduce): merge
   * every active query's progress into one status row each.
   */
  def status(): Seq[(String, String, Long)] =
    queries.asScala.toSeq.map { case (name, q) =>
      val rows = Option(q.lastProgress).map(_.numInputRows).getOrElse(0L)
      (name, if (q.isActive) "READY" else "STOPPED", rows)
    }.sortBy(_._1)
}
