package graft.streaming

import org.apache.hadoop.fs.{FileSystem, Path}

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * CDC merge: apply old/new-image change records (T7 envelopes carrying
 * `OpCode {INSERT, UPDATE, DELETE}` + a change sequence number) onto a
 * keyed materialized state table — SURVEY.md §7.3 hard part (2).
 *
 * Reference semantics: BrooklinEnvelope.java:16-21 (key = primary key,
 * value = new image), BrooklinEnvelopeMetadataConstants.java:19-29
 * (opcodes, Scn). The reference only TRANSPORTS these; materializing
 * them is the downstream contract this engine completes.
 *
 * Spark-first shape: last-writer-wins per key by scn is one window
 * rank — partial-agg/shuffle on the key, no driver loop. The streaming
 * form applies the same reduction per micro-batch in `foreachBatch`
 * against a parquet state directory that is SPLIT INTO KEY-HASH
 * BUCKETS: an epoch rewrites only the buckets whose keys it touches,
 * so per-epoch write cost is O(|touched buckets|), not O(|state|) —
 * at 100 TB an epoch touching a handful of keys rewrites a handful of
 * bucket directories, never the full table (Delta's MERGE INTO is the
 * managed-table equivalent; this is the same file-pruning idea with
 * explicit buckets).
 *
 * Layout: `statePath/bNNNNN/` per bucket; scratch (`statePath.tmp/`)
 * and move-aside backups (`statePath.bak/`) live OUTSIDE the state
 * root so state readers never see half-written files.
 *
 * Crash safety per bucket: new bucket contents land in scratch, the
 * previous bucket dir is renamed aside, scratch renamed in, and ONLY
 * THEN is the backup dropped — at every instant either the bucket dir
 * or its backup holds a complete copy. [[currentState]] resolves
 * whichever survives. A replayed micro-batch (Spark's at-least-once
 * foreachBatch contract) re-merges idempotently: last-writer-wins by
 * scn makes re-applying the same changes a no-op.
 */
object CdcMerge {

  /** Default key-hash bucket count for the state directory. Sized so
    * one bucket's state fits an executor comfortably; at larger state
    * sizes pass a bigger count (buckets = parallel units AND the
    * rewrite granularity). */
  val DefaultBuckets = 16

  /**
   * Collapse a CDC log (key, scn, opcode, value...) to its final
   * state: the highest-scn record per key, dropping keys whose last
   * operation is DELETE.
   */
  def latestState(log: DataFrame, keyCols: Seq[String], scnCol: String,
      opcodeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(scnCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opcodeCol) =!= "DELETE")
      .drop("__rn")
  }

  /**
   * Expand a CDC log into its full change HISTORY (SCD2-style
   * validity intervals): one row per non-DELETE change with
   * [scn, scn_to) bounds — scn_to is the next change's scn for the
   * same key (whatever its opcode), or -1 while the version is still
   * current. A trailing DELETE closes the last interval and leaves
   * the key with no current row. This is the audit view the
   * envelope's old/new-image design exists for
   * (BrooklinEnvelope.java:16-21: key = primary key, value = new
   * image, previousValue = old image; opcodes
   * BrooklinEnvelopeMetadataConstants.java:19-23) — every
   * superseded image stays queryable, not just the latest state.
   *
   * Scale: one keyed window (partition by key, order by scn), the
   * same shuffle key as the latestState collapse — never a global
   * ordering.
   */
  def changeHistory(log: DataFrame, keyCols: Seq[String], scnCol: String,
      opcodeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(col(scnCol))
    log
      .withColumn("scn_to", coalesce(lead(col(scnCol), 1).over(w), lit(-1L)))
      .filter(col(opcodeCol) =!= "DELETE")
      .withColumn("is_current", col("scn_to") === -1L)
  }

  private def bucketDir(statePath: String, b: Long) =
    new Path(statePath, f"b$b%05d")
  private def bakDir(statePath: String, b: Long) =
    new Path(s"$statePath.bak", f"b$b%05d")

  /** The live copy of one bucket: the bucket dir, or its backup if a
    * crash happened between the two swap renames. */
  private def liveBucket(fs: FileSystem, statePath: String, b: Long): Option[Path] = {
    val main = bucketDir(statePath, b)
    if (fs.exists(main)) Some(main)
    else {
      val bak = bakDir(statePath, b)
      if (fs.exists(bak)) Some(bak) else None
    }
  }

  /**
   * Atomically install the pre-written scratch dir `tmp` as bucket
   * `b`'s state. A missing `tmp` means the bucket's merged contents
   * are EMPTY (every key deleted — a partitioned write emits no dir
   * for an empty partition); an empty dir is installed so the swap
   * still retires the old copy.
   *
   * Ordering is the load-bearing part: the previous copy is deleted
   * only AFTER the replacement is fully installed, and every rename is
   * checked — a false return fails the epoch so Spark replays it
   * instead of silently committing a half-swap.
   */
  private def installBucketDir(fs: FileSystem, tmp: Path,
      statePath: String, b: Long): Unit = {
    val state = bucketDir(statePath, b)
    val bak = bakDir(statePath, b)
    if (!fs.exists(tmp)) fs.mkdirs(tmp)
    if (fs.exists(state)) {
      // A backup alongside a live state dir is a stale leftover of a
      // crash after install-but-before-cleanup; the state dir is newer.
      if (fs.exists(bak)) require(fs.delete(bak, true), s"cannot clear stale $bak")
      fs.mkdirs(bak.getParent)
      require(fs.rename(state, bak), s"cannot move aside $state")
    }
    // If state was absent (first write, or recovering from a crash
    // mid-swap) the existing .bak — the only live copy — stays put
    // until the new state, merged FROM it, is installed.
    fs.mkdirs(state.getParent)
    require(fs.rename(tmp, state), s"cannot install $tmp as $state")
    fs.delete(bak, true) // safe: state is installed; a leftover is handled above
  }

  /**
   * Apply one micro-batch of changes onto the bucketed parquet state
   * at `statePath`: untouched buckets are not read or written; within
   * a touched bucket, untouched keys survive, changed keys take the
   * batch's final image, DELETEs drop.
   *
   * ONE Spark job merges every touched bucket: the live copies of all
   * touched buckets are read as one multi-path scan, batch survivors
   * and final images union, and a `partitionBy("__bucket")` write
   * lands each bucket's new contents under `statePath.tmp/__bucket=N`
   * in a single pass. The per-bucket crash-safe rename swap then runs
   * over the pre-written scratch dirs — metadata-only operations, so
   * serializing THOSE is O(touched) namenode calls, not O(touched)
   * Spark jobs (the previous form launched a full merge job per
   * bucket; at 256 buckets that serialized the sink on the driver).
   * The existing rows' bucket is recomputed from their key columns —
   * the bucket function is pure, so it always agrees with the dir the
   * row was read from.
   */
  def applyBatch(spark: SparkSession, batch: DataFrame, statePath: String,
      keyCols: Seq[String], scnCol: String, opcodeCol: String,
      numBuckets: Int = DefaultBuckets): Unit = {
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val bucketOf =
      pmod(Portable.hash64(concat_ws("|", keyCols.map(col): _*)), lit(numBuckets.toLong))
    val withBucket = batch.withColumn("__bucket", bucketOf)
    // Touched-bucket ids: bounded by numBuckets — control-plane
    // cardinality, not data cardinality, so the collect is safe.
    val touched = withBucket.select("__bucket").distinct()
      .collect().map(_.getLong(0)).sorted
    if (touched.isEmpty) return
    val latest = latestState(withBucket, keyCols, scnCol, opcodeCol)
    val livePaths = touched.toSeq.flatMap(liveBucket(fs, statePath, _)).map(_.toString)
    val merged = if (livePaths.nonEmpty) {
      val existing = spark.read.parquet(livePaths: _*).withColumn("__bucket", bucketOf)
      val touchedKeys = withBucket.select(keyCols.map(col): _*).distinct()
      existing.join(touchedKeys, keyCols, "left_anti")
        .unionByName(latest.select(existing.columns.map(col): _*))
    } else latest
    val tmpRoot = new Path(s"$statePath.tmp")
    fs.delete(tmpRoot, true) // leftovers of a crashed epoch
    merged.write.mode(SaveMode.Overwrite).partitionBy("__bucket")
      .parquet(tmpRoot.toString)
    touched.foreach { b =>
      installBucketDir(fs, new Path(tmpRoot, s"__bucket=$b"), statePath, b)
    }
    fs.delete(tmpRoot, true)
  }

  /** The full live state: the union of every bucket's surviving copy.
    * Falls back to a flat (non-bucketed) layout for state dirs written
    * by older versions. */
  def currentState(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val root = new Path(statePath)
    val bakRoot = new Path(statePath + ".bak")
    def bucketIds(p: Path): Set[Long] =
      if (!fs.exists(p)) Set.empty
      else fs.listStatus(p).toSeq
        .filter(s => s.isDirectory && s.getPath.getName.matches("b\\d{5}"))
        .map(_.getPath.getName.drop(1).toLong).toSet
    val ids = bucketIds(root) ++ bucketIds(bakRoot)
    if (ids.nonEmpty) {
      val paths = ids.toSeq.sorted.flatMap(liveBucket(fs, statePath, _)).map(_.toString)
      Some(spark.read.parquet(paths: _*))
    } else if (fs.exists(root)) Some(spark.read.parquet(statePath))
    else if (fs.exists(bakRoot)) Some(spark.read.parquet(bakRoot.toString))
    else None
  }
}
