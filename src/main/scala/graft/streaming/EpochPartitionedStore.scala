package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/**
 * Durable hive-partitioned, epoch-committed parquet store with a
 * bounded in-run view and generation compaction — the persistence
 * half shared by [[IncrementalLexIndex]] (postings partitioned by
 * term-hash bucket) and [[IncrementalVectorIndex]] (vectors
 * partitioned by IVF cell). One crash protocol, two indexes.
 *
 * Layout under `dir`:
 *  - `<partCol>=<v>/graft-<ns>-e<N>-p<i>.parquet` — epoch data,
 *    committed through [[PipelineManager.epochAppendPartitioned]]
 *    (whole-epoch marker: an epoch is visible in all partitions or
 *    none).
 *  - `_graft_commits/...` — epoch/generation markers. Real-epoch
 *    markers are kept FOREVER (they are the replay protection);
 *    generation markers only until superseded.
 *  - `_compact_state-<g>` — compaction generation `g` is durably
 *    recorded. Written create-once AFTER the generation's data
 *    commits; the highest such file is the recovery authority, and
 *    ONLY its name is authoritative (the body is never parsed, so a
 *    torn write can neither brick recovery nor under-sweep).
 *
 * The two bounds this class owns:
 *  - The in-run view is a [[DurableIndexView]] (union plan never
 *    wider than `refreshEvery`, partition column preserved across
 *    leaf-file extensions via basePath).
 *  - Every `compactEvery` epochs the store is rewritten ~one file per
 *    partition value and superseded epoch files are swept, so FILE
 *    COUNT stays flat in epoch count — the difference between a demo
 *    and a month-long 100 TB ingest.
 *
 * Crash contract (single maintenance thread — the foreachBatch loop):
 *  - A crashed EPOCH append left no marker; the streaming replay of
 *    that epoch redoes it through the epochAppend redo path before
 *    anything reads the store again.
 *  - A crashed COMPACTION is rolled back or completed by the next
 *    constructor: a generation with data (or marker) but no state
 *    record never happened (its inputs are still present — the sweep
 *    only runs after the record lands) and is deleted; the recorded
 *    generation's sweep is re-run (idempotent).
 *
 * `onSweep(gen, upTo)` lets the owner sweep sibling artifacts on the
 * same cadence (the lexical index compacts its cumulative stats rows
 * there); it runs inside both [[compact]] and constructor recovery
 * and must be idempotent.
 */
final class EpochPartitionedStore(spark: SparkSession, val dir: String,
    partCol: String, name: String,
    refreshEvery: Int = DurableIndexView.DefaultRefreshEvery,
    compactEvery: Int = 0,
    onSweep: (Long, Long) => Unit = (_, _) => ()) {
  require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
  private val conf = spark.sparkContext.hadoopConfiguration
  private val fs = new Path(dir).getFileSystem(conf)
  // distinct epoch namespaces for data vs compaction generations:
  // markers and file names can never collide (namespaceOf is
  // injective; '.' encodes to _2e)
  private val dataPipe = s"$name.p"
  private val genPipe = s"$name.g"
  private val dataNs = PipelineManager.namespaceOf(dataPipe)
  private val genNs = PipelineManager.namespaceOf(genPipe)
  private var view: Option[DurableIndexView] = None

  recover()

  // Newest epoch the store (and therefore any fresh-read view)
  // already contains: a REPLAYED epoch (epoch <= this) must not
  // extend the view — its files are already in the view's fresh read,
  // and a second union of the same rows would double every
  // aggregate computed over the store. Computed from the surviving
  // file names plus the recorded compaction coverage (compaction
  // sweeps the files but its record keeps the coverage).
  private def storeCeiling: Long =
    (dataFiles(dataNs).map(st => epochOf(st.getPath.getName)) ++
      latestGenState.map(_._2))
      .foldLeft(Long.MinValue)(math.max)
  private var lastSeenEpoch: Long = storeCeiling
  // Serializes view creation/extension/reset between the maintenance
  // thread and concurrent reader threads: a reader-created fresh view
  // already contains the in-flight epoch's committed files, and an
  // unsynchronized extend right after would union them twice.
  //
  // What this lock does NOT give: isolation of an in-flight reader
  // JOB from a compaction sweep — a Spark job scanning the old union
  // plan while sweep() deletes its files fails with FileNotFound.
  // With `compactEvery` enabled the owner must consume each serve
  // result before the maintenance thread's next appendEpoch (the
  // foreachBatch ingest loops do exactly this: the serve output is
  // epoch-committed before the loop advances). Snapshot-isolated
  // concurrent readers would need a table format with a manifest
  // (Iceberg/Delta), which this store deliberately does not reinvent.
  private val viewLock = new Object

  /** Epoch number parsed from a committed file name
    * `graft-<ns>-e<N>-p<i>.parquet` ('-' is structural: it never
    * appears inside an encoded namespace or a number). */
  private def epochOf(fileName: String): Long =
    fileName.split('-')(2).drop(1).toLong

  private def dataFiles(ns: String): Seq[org.apache.hadoop.fs.FileStatus] =
    Option(fs.globStatus(
        new Path(dir, s"$partCol=*/graft-$ns-e*-p*.parquet")))
      .toSeq.flatten.toSeq

  private def stateFile(gen: Long) = new Path(dir, s"_compact_state-$gen")

  /** Highest durably-recorded compaction generation and the epoch it
    * covers (upTo == gen by construction), or None before the first
    * compaction. */
  private def latestGenState: Option[(Long, Long)] = {
    val states = Option(fs.globStatus(new Path(dir, "_compact_state-*")))
      .toSeq.flatten
      .map(st => st.getPath.getName.stripPrefix("_compact_state-").toLong)
    if (states.isEmpty) None else { val g = states.max; Some((g, g)) }
  }

  /** Roll back unrecorded compaction attempts, then re-run the
    * recorded generation's sweep — both idempotent, both no-ops on a
    * cleanly-closed store. */
  private def recover(): Unit = {
    val recorded = latestGenState
    val cutoff = recorded.map(_._1).getOrElse(Long.MinValue)
    dataFiles(genNs).filter(st => epochOf(st.getPath.getName) > cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    val genMarkers = new Path(dir, s"_graft_commits/$genNs")
    if (fs.exists(genMarkers))
      fs.listStatus(genMarkers).toSeq
        .filter(_.getPath.getName.toLong > cutoff)
        .foreach(st => fs.delete(st.getPath, false))
    recorded.foreach { case (g, upTo) => sweep(g, upTo) }
  }

  /** Delete everything generation `gen` superseded: real-epoch data
    * ≤ `upTo`, older generations, their markers (NOT the real-epoch
    * markers — those are the replay protection), older state records,
    * and whatever the owner's `onSweep` covers. Idempotent. */
  private def sweep(gen: Long, upTo: Long): Unit = {
    dataFiles(dataNs).filter(st => epochOf(st.getPath.getName) <= upTo)
      .foreach(st => fs.delete(st.getPath, false))
    dataFiles(genNs).filter(st => epochOf(st.getPath.getName) < gen)
      .foreach(st => fs.delete(st.getPath, false))
    val genMarkers = new Path(dir, s"_graft_commits/$genNs")
    if (fs.exists(genMarkers))
      fs.listStatus(genMarkers).toSeq.filter(_.getPath.getName.toLong < gen)
        .foreach(st => fs.delete(st.getPath, false))
    Option(fs.globStatus(new Path(dir, "_compact_state-*"))).toSeq.flatten
      .filter(_.getPath.getName.stripPrefix("_compact_state-").toLong < gen)
      .foreach(st => fs.delete(st.getPath, false))
    onSweep(gen, upTo)
  }

  private def ensureView(): DurableIndexView = viewLock.synchronized {
    view.getOrElse {
      val v = new DurableIndexView(spark, dir, refreshEvery,
        partitioned = true)
      view = Some(v)
      // everything committed so far is in the fresh read — a still-
      // running appendEpoch of the newest epoch must NOT extend again
      lastSeenEpoch = math.max(lastSeenEpoch, storeCeiling)
      v
    }
  }

  /** Does the store hold any committed data files? */
  def hasData: Boolean =
    view.nonEmpty || dataFiles(dataNs).nonEmpty || dataFiles(genNs).nonEmpty

  /** Highest epoch DURABLY COMMITTED into the store — marker-based
    * (real-epoch markers are kept forever), so an epoch whose batch
    * produced no data files still counts, and compaction (which
    * sweeps files but never real-epoch markers) cannot lower it.
    * Long.MinValue before the first commit. Owners whose sibling
    * stores commit BEFORE this one (the lexical index's stats
    * accumulator) cap their cold reads here, so a crash between the
    * two commits can never serve stats describing absent data. */
  def committedEpochCeiling: Long = {
    val markers = new Path(dir, s"_graft_commits/$dataNs")
    val ms = if (fs.exists(markers))
      fs.listStatus(markers).toSeq.map(_.getPath.getName.toLong) else Nil
    ms.foldLeft(Long.MinValue)(math.max)
  }

  /** The bounded in-run view of the store, or None before any data —
    * readers must not force a schema inference over an empty dir. */
  def frameIfAny: Option[DataFrame] =
    if (!hasData) None else Some(ensureView().frame)

  /** Commit one epoch's rows (which must carry `partCol`), extend the
    * view by exactly this epoch's files (replays never double-extend),
    * and compact when the cadence lands. Idempotent per epoch. */
  def appendEpoch(frame: DataFrame, epoch: Long): Unit = {
    val files = PipelineManager.epochAppendPartitioned(
      frame, dir, partCol, epoch, dataPipe)
    viewLock.synchronized {
      if (epoch > lastSeenEpoch) {
        if (view.isEmpty) { if (files.nonEmpty) ensureView(): Unit }
        else view.get.extend(files)
        lastSeenEpoch = epoch
      }
    }
    if (compactEvery > 0 && (epoch + 1) % compactEvery == 0) compact(epoch)
  }

  /** Rewrite the whole store as generation `epoch`: one shuffle by
    * partition value (so each directory ends with ~one file),
    * committed through the same partitioned epoch append under the
    * generation namespace, recorded durably, THEN the superseded
    * files are swept — publish-before-delete, so no crash window
    * ever loses the only copy of an epoch. A replay of the epoch
    * that triggered an already-recorded generation is a no-op. */
  private def compact(epoch: Long): Unit = {
    if (latestGenState.exists(_._1 >= epoch)) return // replayed trigger
    // an all-empty-epoch store has nothing to rewrite — and a parquet
    // read over a dir holding only markers would throw, killing the
    // stream on a cadence tick
    if (!hasData) return
    val full = spark.read.parquet(dir).repartition(col(partCol))
    PipelineManager.epochAppendPartitioned(
      full, dir, partCol, epoch, genPipe): Unit
    val out = fs.create(stateFile(epoch), false) // create-once: authority
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    sweep(epoch, epoch)
    // the view's union plan still names swept files — drop it
    viewLock.synchronized(view.foreach(_.reset()))
  }

  /** Committed data-file count across all partitions — the quantity
    * compaction keeps flat; probes and specs assert on it. */
  def fileCount: Int = dataFiles(dataNs).size + dataFiles(genNs).size
}
