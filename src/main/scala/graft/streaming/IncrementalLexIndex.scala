package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.text.Text

/**
 * Full-vocabulary incremental inverted index — the streaming
 * maintainer of the build-once/serve-many lexical store that
 * [[graft.text.Text.buildLexicalIndex]] builds in batch (t25's
 * serving artifact), upgraded so ingest keeps it fresh WITHOUT a
 * fixed term set: every epoch appends its postings for EVERY term in
 * the batch, hive-partitioned by the same 64-way term-hash bucket the
 * batch builder uses, so a query whose terms were never named at
 * ingest still serves from bucket-pruned index files (never the
 * corpus).
 *
 * Store layout under `dir`:
 *  - `postings/tb=<b>/graft-<ns>-e<N>-p<i>.parquet` — (term, doc_id,
 *    tf, dl): one row per (doc, term), the doc length denormalized
 *    on-row (Lucene's norms inlined — the s23 form), so serving needs
 *    no docstats join and doc-length maintenance is append-only.
 *  - `stats/graft-<ns>-e<N>-p0.parquet` — the O(1) running corpus
 *    accumulator: one CUMULATIVE (epoch, nd, sum_dl) row per epoch,
 *    epoch-committed so a crash-replayed epoch REUSES its committed
 *    row instead of re-adding its batch. dl is an integer-valued
 *    double, so sum_dl is exact and avgdl = sum_dl/nd is bit-identical
 *    to an AVG over the ingested prefix.
 *  - `postings/_graft_commits/...` — epoch/generation markers
 *    ([[PipelineManager.epochAppendPartitioned]]); real-epoch markers
 *    are kept FOREVER (they are the replay protection), generation
 *    markers only until superseded.
 *  - `_compact_state-<g>` — compaction generation `g` is durable:
 *    holds the epoch the generation covers. Written create-once AFTER
 *    the generation's data commits; the highest such file is the
 *    recovery authority.
 *
 * Scale shape, piece by piece:
 *  - Append is O(batch): tokenize one batch, one partitioned epoch
 *    commit, one 1-row stats row. Nothing rescans history.
 *  - Reads are bounded two ways: the in-run view is a
 *    [[DurableIndexView]] (union plan never wider than
 *    `refreshEvery`, partition column preserved via basePath), and
 *    `compactEvery` epochs the store is rewritten one-file-per-bucket
 *    and superseded epoch files are swept — so FILE COUNT stays flat
 *    in epoch count, the difference between "works for a demo" and
 *    "ingests for a month" at 100 TB.
 *  - Serving prunes at the directory level: a |q|-term query opens
 *    ≤ |q| of the 64 bucket directories (PartitionFilters), pushes
 *    the term set into those scans, and never touches corpus text.
 *
 * Crash contract (single maintenance thread — the foreachBatch loop):
 *  - A crashed EPOCH append left no marker; the streaming replay of
 *    that epoch redoes it through the epochAppend redo path before
 *    anything reads the store again.
 *  - A crashed COMPACTION is rolled back or completed by the next
 *    constructor: a generation with data (or marker) but NO
 *    `_compact_state-<g>` record is deleted (its inputs are still
 *    present — the sweep only runs after the record lands), and the
 *    recorded generation's sweep is re-run (idempotent). Either way
 *    the store re-opens exactly once-committed.
 *
 * Reference surface: the reference has no retrieval; this closes the
 * engine's own build-once/serve-many contract (Text.scala
 * buildLexicalIndex/bm25TopKFromIndex) for streaming ingest.
 */
final class IncrementalLexIndex(spark: SparkSession, dir: String,
    name: String = "lexidx",
    refreshEvery: Int = DurableIndexView.DefaultRefreshEvery,
    compactEvery: Int = 0) {
  require(compactEvery >= 0, s"compactEvery must be >= 0, got $compactEvery")
  private val postingsDir = s"$dir/postings"
  private val statsDir = s"$dir/stats"
  private val conf = spark.sparkContext.hadoopConfiguration
  private val fs = new Path(dir).getFileSystem(conf)
  // distinct epoch namespaces per artifact: postings, stats, and
  // compaction generations can never collide in markers or file names
  // (namespaceOf is injective; '.' encodes to _2e)
  private val postPipe = s"$name.p"
  private val statsPipe = s"$name.s"
  private val genPipe = s"$name.g"
  private val postNs = PipelineManager.namespaceOf(postPipe)
  private val statsNs = PipelineManager.namespaceOf(statsPipe)
  private val genNs = PipelineManager.namespaceOf(genPipe)
  private var view: Option[DurableIndexView] = None
  // Latest cumulative stats row (epoch, nd, sum_dl) — the single-
  // writer contract makes this cache exact, so the per-epoch hot path
  // never re-reads the stats store; fresh opens and replays of older
  // epochs fall back to the (compaction-swept, bounded) store read.
  private var lastStats: Option[(Long, Double, Double)] = None

  recover()

  // Newest epoch the store (and therefore any fresh-read view)
  // already contains: a REPLAYED epoch (epoch <= this) must not
  // extend the view — its files are already in the view's fresh read,
  // and a second union of the same postings would double tf/df and
  // every score. Computed from the surviving file names plus the
  // recorded compaction coverage (compaction sweeps the files but its
  // record keeps the coverage).
  private def storeCeiling: Long =
    (postingFiles(postNs).map(st => epochOf(st.getPath.getName)) ++
      latestGenState.map(_._2))
      .foldLeft(Long.MinValue)(math.max)
  private var lastSeenEpoch: Long = storeCeiling
  // Serializes view creation/extension/reset between the maintenance
  // thread and concurrent serve() readers: a serve()-created fresh
  // view already contains the in-flight epoch's committed files, and
  // an unsynchronized extend right after would union them twice.
  private val viewLock = new Object

  /** Epoch number parsed from a committed file name
    * `graft-<ns>-e<N>-p<i>.parquet` ('-' is structural: it never
    * appears inside an encoded namespace or a number). */
  private def epochOf(fileName: String): Long =
    fileName.split('-')(2).drop(1).toLong

  private def postingFiles(ns: String): Seq[org.apache.hadoop.fs.FileStatus] =
    Option(fs.globStatus(new Path(postingsDir, s"tb=*/graft-$ns-e*-p*.parquet")))
      .toSeq.flatten.toSeq

  private def stateFile(gen: Long) = new Path(dir, s"_compact_state-$gen")

  /** Highest durably-recorded compaction generation and the epoch it
    * covers, or None before the first compaction. The generation
    * number in the FILE NAME is the sole authority (upTo == gen by
    * construction; [[compact]] writes the body for humans only) — the
    * body is never parsed, so a crash that tears it (empty OR
    * partial, e.g. "1" of "12") can neither brick recovery with a
    * parse error nor under-sweep and double scores. */
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
    // a generation with data but no state record never happened:
    // delete its files and marker (its inputs are still in the store)
    postingFiles(genNs).filter(st => epochOf(st.getPath.getName) > cutoff)
      .foreach(st => fs.delete(st.getPath, false))
    val genMarkers = new Path(postingsDir, s"_graft_commits/$genNs")
    if (fs.exists(genMarkers))
      fs.listStatus(genMarkers).toSeq
        .filter(_.getPath.getName.toLong > cutoff)
        .foreach(st => fs.delete(st.getPath, false))
    recorded.foreach { case (g, upTo) => sweep(g, upTo) }
  }

  /** Delete everything generation `gen` superseded: real-epoch
    * postings ≤ `upTo`, older generations, their markers (NOT the
    * real-epoch markers — those are the replay protection), and
    * older state records. Idempotent. */
  private def sweep(gen: Long, upTo: Long): Unit = {
    postingFiles(postNs).filter(st => epochOf(st.getPath.getName) <= upTo)
      .foreach(st => fs.delete(st.getPath, false))
    postingFiles(genNs).filter(st => epochOf(st.getPath.getName) < gen)
      .foreach(st => fs.delete(st.getPath, false))
    // stats rows are cumulative, so every row below the compaction
    // point is subsumed by the row AT it — sweeping them keeps the
    // stats store's file count flat too (their epoch markers stay:
    // a replayed epoch's marker hit means its row is already folded
    // into the surviving cumulative row)
    Option(fs.globStatus(
        new Path(statsDir, s"graft-$statsNs-e*-p*.parquet")))
      .toSeq.flatten
      .filter(st => epochOf(st.getPath.getName) < upTo)
      .foreach(st => fs.delete(st.getPath, false))
    val genMarkers = new Path(postingsDir, s"_graft_commits/$genNs")
    if (fs.exists(genMarkers))
      fs.listStatus(genMarkers).toSeq.filter(_.getPath.getName.toLong < gen)
        .foreach(st => fs.delete(st.getPath, false))
    Option(fs.globStatus(new Path(dir, "_compact_state-*"))).toSeq.flatten
      .filter(_.getPath.getName.stripPrefix("_compact_state-").toLong < gen)
      .foreach(st => fs.delete(st.getPath, false))
  }

  private def ensureView(): DurableIndexView = viewLock.synchronized {
    view.getOrElse {
      val v = new DurableIndexView(spark, postingsDir, refreshEvery,
        partitioned = true)
      view = Some(v)
      // everything committed so far is in the fresh read — a still-
      // running appendEpoch of the newest epoch must NOT extend again
      lastSeenEpoch = math.max(lastSeenEpoch, storeCeiling)
      v
    }
  }

  /** Cumulative (nd, sum_dl) after folding `epoch`'s batch in — the
    * committed row for THIS epoch wins (crash replay), else the
    * previous cumulative plus this batch's 1-row aggregate. The hot
    * path (a new epoch on a warm instance) is O(1) from the in-memory
    * cache; fresh opens and replays of older epochs read the store,
    * whose row count compaction keeps bounded. */
  private def updateStats(batchDl: DataFrame, epoch: Long): (Double, Double) = {
    def batchAgg(): (Double, Double) = {
      val b = batchDl.agg(count(lit(1)).cast("double"),
        coalesce(sum(col("dl")), lit(0.0))).head()
      (b.getDouble(0), b.getDouble(1))
    }
    val (nd, sumDl) = lastStats match {
      case Some((e, n, s)) if epoch == e => (n, s) // in-run replay
      case Some((e, n, s)) if epoch > e =>
        val (bn, bs) = batchAgg()
        (n + bn, s + bs)
      case _ => // fresh open, or a replay older than the cache
        val existing =
          if (PipelineManager.committedFiles(statsDir, conf).nonEmpty)
            spark.read.parquet(statsDir).collect()
          else Array.empty[org.apache.spark.sql.Row]
        existing.find(_.getLong(0) == epoch) match {
          case Some(r) => (r.getDouble(1), r.getDouble(2))
          case None =>
            val prior = existing.filter(_.getLong(0) < epoch)
              .sortBy(-_.getLong(0)).headOption
            val (bn, bs) = batchAgg()
            (prior.map(_.getDouble(1)).getOrElse(0.0) + bn,
              prior.map(_.getDouble(2)).getOrElse(0.0) + bs)
        }
    }
    import spark.implicits._
    PipelineManager.epochAppend(
      Seq((epoch, nd, sumDl)).toDF("epoch", "nd", "sum_dl").coalesce(1),
      statsDir, epoch, statsPipe): Unit
    if (lastStats.forall(_._1 <= epoch)) lastStats = Some((epoch, nd, sumDl))
    (nd, sumDl)
  }

  /**
   * Fold one ingest batch (`doc_id`, `text`) into the index: ONE
   * tokenize pass of the batch builds the full-vocabulary postings
   * (term, doc_id, tf, dl, tb), committed partition-by-bucket under
   * this epoch; the stats accumulator folds the batch's (count, Σdl);
   * the in-run view extends by exactly this epoch's files; and when
   * the compaction cadence lands, the store is rewritten
   * one-file-per-bucket. Idempotent per epoch end to end.
   */
  def appendEpoch(batch: DataFrame, epoch: Long): Unit = {
    // ONE tokenize of the batch feeds both actions below (the
    // postings write and the stats aggregate) — persisted for exactly
    // the reason buildLexicalIndex persists its token frame: unpinned,
    // each action would re-read the micro-batch and re-split every
    // document.
    val btok = batch.select(col("doc_id"), Text.tokens(col("text")).as("w"))
      .persist()
    val files = try {
      val bpost = btok.select(col("doc_id"),
          size(col("w")).cast("double").as("dl"), explode(col("w")).as("term"))
        .groupBy(col("doc_id"), col("dl"), col("term"))
        .agg(count(lit(1)).cast("double").as("tf"))
        .select(col("term"), col("doc_id"), col("tf"), col("dl"),
          pmod(graft.functions.Portable.hash64(col("term")),
            lit(Text.LexIndexBuckets.toLong)).as("tb"))
      val f = PipelineManager.epochAppendPartitioned(
        bpost, postingsDir, "tb", epoch, postPipe)
      updateStats(btok.select(col("doc_id"),
        size(col("w")).cast("double").as("dl")), epoch): Unit
      f
    } finally btok.unpersist(false): Unit
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
    * bucket (so each bucket directory ends with ~one file), committed
    * through the same partitioned epoch append under the generation
    * namespace, recorded durably, THEN the superseded files are swept
    * — publish-before-delete, so no crash window ever loses the only
    * copy of an epoch. A replay of the epoch that triggered an
    * already-recorded generation is a no-op. */
  private def compact(epoch: Long): Unit = {
    if (latestGenState.exists(_._1 >= epoch)) return // replayed trigger
    val full = spark.read.parquet(postingsDir).repartition(col("tb"))
    PipelineManager.epochAppendPartitioned(
      full, postingsDir, "tb", epoch, genPipe): Unit
    val out = fs.create(stateFile(epoch), false) // create-once: authority
    try out.write(epoch.toString.getBytes("UTF-8")) finally out.close()
    sweep(epoch, epoch)
    // the view's union plan still names swept files — drop it
    viewLock.synchronized(view.foreach(_.reset()))
  }

  /**
   * BM25 top-`k` for `terms` — NONE of which need to have been named
   * at ingest — served from index files only: the postings scan
   * carries the bucket predicate (PartitionFilters: unvisited bucket
   * directories never open) and the term set (PushedFilters inside
   * the visited buckets); (N, avgdl) come from the accumulator's
   * latest row. Identical literal shapes (and bit-identical scores)
   * to [[graft.text.Text.bm25TopK]] over the ingested prefix.
   */
  def serve(terms: Seq[String], k: Int,
      k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // an index that has seen no documents yet (no epochs, or only
    // empty batches) serves an empty result — a ProcessingTime
    // stream's first data-free triggers must not kill the query on
    // an uninferrable-schema read
    val latest: Option[(Double, Double)] =
      lastStats.map(t => (t._2, t._3)).orElse {
        if (PipelineManager.committedFiles(statsDir, conf).isEmpty) None
        else {
          val r = spark.read.parquet(statsDir).collect().maxBy(_.getLong(0))
          Some((r.getDouble(1), r.getDouble(2)))
        }
      }
    val hasPostings = view.nonEmpty ||
      postingFiles(postNs).nonEmpty || postingFiles(genNs).nonEmpty
    if (latest.forall(_._1 == 0.0) || !hasPostings)
      return Seq.empty[(Long, Long, Double)].toDF("doc_id", "rank", "score")
    val (nd, avgdl) = (latest.get._1, latest.get._2 / latest.get._1)
    val buckets = terms.map(t =>
      java.lang.Math.floorMod(graft.functions.Portable.hash64Of(t),
        Text.LexIndexBuckets.toLong).toInt).distinct
    val post = ensureView().frame
      .filter(col("tb").isin(buckets: _*) && col("term").isin(terms: _*))
    val dfT = post.groupBy(col("term"))
      .agg(count(lit(1)).cast("double").as("df"))
    val idf = log((lit(nd) - col("df") + 0.5) / (col("df") + 0.5) + 1)
    val w: Column = idf * col("tf") * (k1 + 1) /
      (col("tf") + lit(k1) * (lit(1) - b + lit(b) * col("dl") / lit(avgdl)))
    val scored = post.join(broadcast(dfT), "term")
      .groupBy(col("doc_id")).agg(round(sum(w), 6).as("score"))
    val top = scored.orderBy(col("score").desc, col("doc_id")).limit(k)
    top.withColumn("rank", row_number()
        .over(Window.orderBy(col("score").desc, col("doc_id"))).cast("long"))
      .select(col("doc_id"), col("rank"), col("score"))
  }

  /** Committed postings data-file count (all buckets) — the quantity
    * compaction keeps flat; probes and specs assert on it. */
  def postingsFileCount(): Int =
    postingFiles(postNs).size + postingFiles(genNs).size
}
