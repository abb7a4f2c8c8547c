package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.DataOpsQueries
import graft.streaming.PipelineManager

/**
 * Streaming-ingest scale probe: the s15 durable-band-index dedup shape
 * (bootstrap index → fixed-size batches stream in → per-epoch verdict
 * commit + admission append) driven at a FIXED batch size over the
 * base corpus and an 8×-unioned corpus — so the 8× run has 8× the
 * epochs and its later epochs dedup against an index ~8× the base
 * run's. What the probe must show for the 100 TB claim:
 *
 *  - per-epoch wall time stays ~flat as the index grows (the planner
 *    broadcasts the small batch side under its threshold, so the
 *    index side is scanned, never shuffled);
 *  - driver heap stays flat across epochs (O(batch) memory — the
 *    in-memory "view" is a union of parquet scans, not cached rows).
 *
 * Prints one line per epoch (seconds, heap, index size) plus an
 * early-vs-late mean comparison per corpus. Numbers land in
 * PERF_NOTES.md.
 */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    val batchDocs = sys.env.getOrElse("SPARK_GRAFT_BATCH_DOCS", "500").toInt
    val scaled = s"/tmp/graft_sscale$factor"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // 8× corpus: same construction as ScaleProbe (ids remapped, copy
    // token prefixed so copies are distinct docs with colliding
    // shingle content — the duplicate-heavy adversarial end).
    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") * factor + i).as("doc_id"),
        concat(lit(s"copy$i "), col("text")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(5 + i.toString.length)).as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scaled/documents.parquet")

    val rt = Runtime.getRuntime
    def heapMb: Long = (rt.totalMemory - rt.freeMemory) >> 20

    def run(dir: String, label: String): Unit = {
      DataOpsQueries.release(dir)
      val d = spark.read.parquet(s"$dir/documents.parquet")
      val bands = DataOpsQueries.sharedBands(spark, dir)
      val rows = d.select(col("doc_id").as("doc"))
        .join(bands, Seq("doc"), "left")
        .select(col("doc"), col("band").cast("long").as("band"), col("bh"))
        .persist()
      val srcDir = java.nio.file.Files.createTempDirectory(s"sscale-src-").toString
      val idxDir = java.nio.file.Files.createTempDirectory(s"sscale-idx-").toString
      val outDir = java.nio.file.Files.createTempDirectory(s"sscale-out-").toString
      val ckpt = java.nio.file.Files.createTempDirectory(s"sscale-ckpt-").toString
      // bootstrap: even docs pre-exist in the corpus index
      rows.filter(pmod(col("doc"), lit(2L)) === 0 && col("band").isNotNull)
        .write.mode("overwrite").parquet(idxDir)
      // odd docs arrive as FIXED-SIZE batches (same batchDocs at 1×
      // and 8×, so the 8× run has ~8× the epochs)
      val odd = rows.filter(pmod(col("doc"), lit(2L)) === 1)
      val nOdd = odd.select(col("doc")).distinct().count()
      val nBatches = math.max(1, (nOdd / batchDocs).toInt)
      (0 until nBatches).foreach { b =>
        odd.filter(pmod(Portable.h(col("doc")), lit(nBatches.toLong)) === b)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      // force strictly-increasing mod times in write order
      val files = new java.io.File(srcDir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.lastModified())
      files.zipWithIndex.foreach { case (f, i) =>
        require(f.setLastModified(1700000000000L + i * 60000L),
          s"setLastModified failed for ${f.getPath}; epoch order would be nondeterministic") }

      val epochSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      // The production view: union extensions with a periodic compacted
      // re-read bounding the plan width. SPARK_GRAFT_REFRESH_EPOCHS
      // overrides the cap (set it above the epoch count to reproduce
      // the round-12 unbounded-union drift for comparison).
      val refreshEvery = sys.env.getOrElse("SPARK_GRAFT_REFRESH_EPOCHS",
        graft.streaming.DurableIndexView.DefaultRefreshEvery.toString).toInt
      val idx = new graft.streaming.DurableIndexView(spark, idxDir, refreshEvery)
      val q = spark.readStream.schema(rows.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(srcDir)
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          val t0 = System.nanoTime()
          val bb = batch.filter(col("band").isNotNull)
          val verdictFrame = graft.dedup.Dedup.indexDedupBatch(idx.frame, bb,
            batch.select(col("doc")).distinct())
          val vFiles = PipelineManager.epochAppend(
            verdictFrame.coalesce(1), outDir, epoch, "sscale-out")
          val verdicts = if (vFiles.isEmpty) verdictFrame.limit(0)
            else spark.read.parquet(vFiles: _*)
          idx.extend(PipelineManager.epochAppend(
            graft.dedup.Dedup.admitBands(bb, verdicts).coalesce(1),
            idxDir, epoch, "sscale-idx"))
          val dt = (System.nanoTime() - t0) / 1e9
          epochSecs += dt
          println(f"[sscale] $label epoch=$epoch ${dt}%.2fs heap=${heapMb}MB")
        }
        .start()
      q.awaitTermination()
      val n = epochSecs.size
      val head = epochSecs.take(3)
      val tail = epochSecs.takeRight(3)
      println(f"[sscale] $label SUMMARY epochs=$n batchDocs=$batchDocs " +
        f"first3_mean=${head.sum / head.size}%.2fs " +
        f"last3_mean=${tail.sum / tail.size}%.2fs " +
        f"late_over_early=${(tail.sum / tail.size) / (head.sum / head.size)}%.2f " +
        f"heap=${heapMb}MB")
      rows.unpersist(true)
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      DataOpsQueries.release(dir)
      Seq(srcDir, idxDir, outDir, ckpt).foreach { p =>
        def del(f: java.io.File): Unit = {
          Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
        }
        del(new java.io.File(p))
      }
    }

    run(base, "1x")
    run(scaled, s"${factor}x")
    spark.stop()
  }

  /** Deterministic doc→batch spreading hash (the gate uses pmod on the
    * raw id; the probe hashes so batch sizes stay even under the 8×
    * id remap). */
  private object Portable {
    def h(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      abs(graft.functions.Portable.hash64(c.cast("string")))
  }
}
