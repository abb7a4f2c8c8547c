package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.queries.DataOpsQueries
import graft.streaming.PipelineManager

/**
 * Streaming-ingest scale probes for the three durable/stateful ingest
 * shapes, each driven at a FIXED batch size over the base corpus and
 * an 8×-unioned corpus — so the 8× run has 8× the epochs. Per-epoch
 * wall time staying ~flat as epochs accumulate is the 100 TB claim
 * under test; each shape has its own reason to stay flat:
 *
 *  - s15 shape (growing durable band index): the planner broadcasts
 *    the O(batch) side, the index side is scanned never shuffled, and
 *    the in-run view's union plan is BOUNDED (DurableIndexView swaps
 *    to a compacted re-read every K epochs — the round-12 probe
 *    measured 22% late-epoch drift from the unbounded union).
 *  - s14 shape (watermark-bounded streaming dedup): state-store size
 *    is bounded by the watermark, so per-epoch maintenance cost is
 *    O(batch + in-horizon state), independent of how many epochs ran.
 *  - s20 shape (static benchmark decontamination): the index is
 *    immutable, read once per run — per-epoch cost must be O(batch)
 *    BY CONSTRUCTION; the probe proves the construction.
 *
 * Prints one line per epoch (seconds, heap) plus an early-vs-late
 * mean comparison per corpus and shape. Numbers land in PERF_NOTES.md.
 * SPARK_GRAFT_PROBE_SHAPES selects shapes (default "s15,s14,s20");
 * SPARK_GRAFT_REFRESH_EPOCHS overrides the s15 view's plan-width cap
 * (set it above the epoch count to reproduce the unbounded drift).
 */
object StreamScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    val batchDocs = sys.env.getOrElse("SPARK_GRAFT_BATCH_DOCS", "500").toInt
    val shapes = sys.env.getOrElse("SPARK_GRAFT_PROBE_SHAPES", "s15,s14,s20")
      .split(",").map(_.trim).filter(_.nonEmpty).toSet
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

    def tmp(tag: String): String =
      java.nio.file.Files.createTempDirectory(tag).toString

    def deleteAll(paths: String*): Unit = paths.foreach { p =>
      def del(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
      }
      del(new java.io.File(p))
    }

    /** Corpus band frame (doc, band, bh), persisted; caller unpersists. */
    def bandRows(dir: String): DataFrame = {
      DataOpsQueries.release(dir)
      val d = spark.read.parquet(s"$dir/documents.parquet")
      d.select(col("doc_id").as("doc"))
        .join(DataOpsQueries.sharedBands(spark, dir), Seq("doc"), "left")
        .select(col("doc"), col("band").cast("long").as("band"), col("bh"))
        .persist()
    }

    /** Write the odd-doc half of `rows` as nBatches one-file batches
      * (hash-spread so sizes stay even under the 8× id remap), with
      * forced strictly-increasing mod times so maxFilesPerTrigger=1
      * replays them in write order. Returns the batch count. An
      * optional per-batch projection lets a shape attach batch-indexed
      * columns (s14's event-time). */
    def writeOddBatches(rows: DataFrame, srcDir: String,
        project: (DataFrame, Int) => DataFrame = (df, _) => df,
        docsPerBatch: Int = batchDocs): Int = {
      val odd = rows.filter(pmod(col("doc"), lit(2L)) === 1)
      val nOdd = odd.select(col("doc")).distinct().count()
      val nBatches = math.max(1, (nOdd / docsPerBatch).toInt)
      (0 until nBatches).foreach { b =>
        project(odd.filter(
            pmod(Portable.h(col("doc")), lit(nBatches.toLong)) === b), b)
          .coalesce(1).write.mode("append").parquet(srcDir)
      }
      val files = new java.io.File(srcDir).listFiles()
        .filter(_.getName.startsWith("part-")).sortBy(_.lastModified())
      files.zipWithIndex.foreach { case (f, i) =>
        require(f.setLastModified(1700000000000L + i * 60000L),
          s"setLastModified failed for ${f.getPath}; epoch order would be nondeterministic") }
      nBatches
    }

    /** Drive a stream of `srcDir` files (one epoch each) through
      * `body`, timing each epoch, then print the flatness summary.
      * `postEpoch` runs OUTSIDE the timed window — file-count
      * sampling (a glob whose cost grows with on-disk file count)
      * must not bias the late_over_early ratio it sits next to. */
    def drive(shape: String, label: String, srcDir: String, ckpt: String,
        schema: org.apache.spark.sql.types.StructType,
        pre: DataFrame => DataFrame, docsLabel: Int = batchDocs,
        postEpoch: () => Unit = () => ())(
        body: (DataFrame, Long) => Unit): Unit = {
      val epochSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val q = pre(spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", "1")
          .parquet(srcDir))
        .writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          val t0 = System.nanoTime()
          body(batch, epoch)
          val dt = (System.nanoTime() - t0) / 1e9
          epochSecs += dt
          println(f"[sscale] $shape $label epoch=$epoch ${dt}%.2fs heap=${heapMb}MB")
          postEpoch()
        }
        .start()
      q.awaitTermination()
      val n = epochSecs.size
      val head = epochSecs.take(3)
      val tail = epochSecs.takeRight(3)
      println(f"[sscale] $shape $label SUMMARY epochs=$n batchDocs=$docsLabel " +
        f"first3_mean=${head.sum / head.size}%.2fs " +
        f"last3_mean=${tail.sum / tail.size}%.2fs " +
        f"late_over_early=${(tail.sum / tail.size) / (head.sum / head.size)}%.2f " +
        f"heap=${heapMb}MB")
    }

    // ---- s15 shape: growing durable band index, bounded-plan view ----
    def runIndexDedup(dir: String, label: String): Unit = {
      val rows = bandRows(dir)
      val srcDir = tmp("sscale-src-"); val idxDir = tmp("sscale-idx-")
      val outDir = tmp("sscale-out-"); val ckpt = tmp("sscale-ckpt-")
      // bootstrap: even docs pre-exist in the corpus index
      rows.filter(pmod(col("doc"), lit(2L)) === 0 && col("band").isNotNull)
        .write.mode("overwrite").parquet(idxDir)
      writeOddBatches(rows, srcDir): Unit
      val refreshEvery = sys.env.getOrElse("SPARK_GRAFT_REFRESH_EPOCHS",
        graft.streaming.DurableIndexView.DefaultRefreshEvery.toString).toInt
      val idx = new graft.streaming.DurableIndexView(spark, idxDir, refreshEvery)
      drive("s15shape", label, srcDir, ckpt, rows.schema, identity) { (batch, epoch) =>
        idx.extend(PipelineManager.epochAppend(
          PipelineManager.dedupAdmissionEpoch(
            idx.frame, batch, outDir, epoch, "sscale-out"),
          idxDir, epoch, "sscale-idx"))
      }
      rows.unpersist(true)
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      DataOpsQueries.release(dir)
      deleteAll(srcDir, idxDir, outDir, ckpt)
    }

    // ---- s30 shape: the s15 admission loop on the TIERED store ----
    // Same dedup semantics and per-epoch cost shape as s15; the axis
    // this probe adds is the STORAGE layer: s15's flat index appends
    // one file per epoch forever (the 8× run ends at bootstrap+N
    // files), while the EpochPartitionedStore's tier merges keep the
    // live file count flat and each epoch's bytes are rewritten once
    // per level (epochsRewritten ≈ E·log_T E, vs Σe for a full
    // rewrite on the same cadence). Since r17 this is ALSO the s16
    // gate's storage form (its ANN band admission differs only in
    // band construction — same store, same admission loop), so this
    // shape's flatness evidence covers both gates.
    def runStoreDedup(dir: String, label: String): Unit = {
      val rows = bandRows(dir)
      val srcDir = tmp("sscale30-src-"); val idxDir = tmp("sscale30-idx-")
      val outDir = tmp("sscale30-out-"); val ckpt = tmp("sscale30-ckpt-")
      def withPb(df: DataFrame): DataFrame = df.withColumn("pb",
        pmod(graft.functions.Portable.hash64(col("bh")), lit(16L)))
      val store = new graft.streaming.EpochPartitionedStore(spark,
        s"$idxDir/bands", "pb", "sscale30", compactEvery = 8)
      store.appendEpoch(withPb(
        rows.filter(pmod(col("doc"), lit(2L)) === 0 && col("band").isNotNull))
        .coalesce(1), 0L)
      writeOddBatches(rows, srcDir): Unit
      val files = scala.collection.mutable.ArrayBuffer.empty[Int]
      drive("s30shape", label, srcDir, ckpt, rows.schema, identity,
          postEpoch = () => files += store.fileCount) { (batch, epoch) =>
        val idxFrame = store.frameIfAny
          .map(_.select(col("doc"), col("band"), col("bh")))
          .getOrElse(batch.limit(0)
            .select(col("doc"), col("band"), col("bh")))
        store.appendEpoch(
          withPb(PipelineManager.dedupAdmissionEpoch(
            idxFrame, batch, outDir, epoch, "sscale30-out")),
          epoch + 1)
      }
      val n = files.size
      println(s"[sscale] s30shape $label FILES first=${files.head} " +
        s"max=${files.max} last=${files.last} n=$n")
      println(s"[sscale] s30shape $label REWRITE " +
        s"epochsRewritten=${store.totalEpochsRewritten} " +
        s"fullRewriteAlt=${(n.toLong * n) / 16} " +
        s"bytes=${store.totalRewriteBytes}")
      rows.unpersist(true)
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      DataOpsQueries.release(dir)
      deleteAll(srcDir, idxDir, outDir, ckpt)
    }

    if (shapes("s30")) {
      runStoreDedup(base, "1x"); runStoreDedup(scaled, s"${factor}x")
    }

    // ---- s14 shape: watermark-bounded streaming dedup ----
    // Event time advances ONE HOUR per batch against a 30-minute
    // watermark delay, so each epoch's dedup state is evicted as soon
    // as the next epoch's watermark lands — in-horizon state is
    // O(batch) no matter how many epochs the run processes. The 8×
    // run's 8× epoch count probes exactly that bound.
    def runWatermarkDedup(dir: String, label: String): Unit = {
      val rows = bandRows(dir)
      val srcDir = tmp("sscale14-src-"); val outDir = tmp("sscale14-out-")
      val ckpt = tmp("sscale14-ckpt-")
      writeOddBatches(rows, srcDir, (df, b) =>
        df.filter(col("band").isNotNull).select(col("band"), col("bh"),
          expr(s"timestampadd(HOUR, $b, timestamp'2024-01-01 00:00:00')")
            .as("hr"))): Unit
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("band",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bh",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("hr",
          org.apache.spark.sql.types.TimestampType)))
      drive("s14shape", label, srcDir, ckpt, schema,
        _.withWatermark("hr", "30 minutes")
          .dropDuplicatesWithinWatermark("band", "bh", "hr")) { (batch, epoch) =>
        PipelineManager.epochAppend(batch.coalesce(1), outDir, epoch,
          "sscale-wm"): Unit
      }
      rows.unpersist(true)
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      DataOpsQueries.release(dir)
      deleteAll(srcDir, outDir, ckpt)
    }

    // ---- s20 shape: static benchmark index decontamination ----
    // The SAME static benchmark index serves the 1× and 8× runs (built
    // once from the base corpus's even docs), so flat per-epoch cost at
    // 8× the epoch count shows the verdict join is O(batch) against an
    // index whose plan and size never change. Since r17 the probe also
    // matches the gate's storage form: the QUARANTINE LOG (this
    // shape's one per-epoch-growing artifact) rides
    // EpochPartitionedStore, and the sampled live file count must stay
    // FLAT under tier merges — the flat-append alternative ends at one
    // file per epoch, unbounded over a month of ingest.
    def runDecontam(dir: String, label: String, benchDir: String): Unit = {
      val rows = bandRows(dir)
      val srcDir = tmp("sscale20-src-"); val outDir = tmp("sscale20-out-")
      val ckpt = tmp("sscale20-ckpt-")
      writeOddBatches(rows, srcDir): Unit
      val bench = spark.read.parquet(benchDir) // static; one read per run
      val store = new graft.streaming.EpochPartitionedStore(spark,
        s"$outDir/log", "pb", "sscale20", compactEvery = 8)
      val files = scala.collection.mutable.ArrayBuffer.empty[Int]
      drive("s20shape", label, srcDir, ckpt, rows.schema, identity,
          postEpoch = () => files += store.fileCount) { (batch, epoch) =>
        val bb = batch.filter(col("band").isNotNull)
        store.appendEpoch(
          graft.dedup.Dedup.indexDedupBatch(bench, bb,
            batch.select(col("doc")).distinct())
            .withColumn("pb", pmod(
              graft.functions.Portable.hash64(col("doc")), lit(16L)))
            .coalesce(1),
          epoch)
      }
      println(s"[sscale] s20shape $label FILES first=${files.head} " +
        s"max=${files.max} last=${files.last} n=${files.size}")
      println(s"[sscale] s20shape $label REWRITE " +
        s"epochsRewritten=${store.totalEpochsRewritten} " +
        s"bytes=${store.totalRewriteBytes}")
      rows.unpersist(true)
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      DataOpsQueries.release(dir)
      deleteAll(srcDir, outDir, ckpt)
    }

    // ---- q66 shape: destination-reuse fan-out cost curve ----
    // One source, N destinations served by ONE group query — the real
    // startGroup path (persist around the sink loop). The claim under
    // test is single-materialization: per-epoch cost grows with bytes
    // WRITTEN only (a slope of one destination write per added
    // member), never with N source scans. Epoch times come from the
    // engine's own progress events (triggerExecution), so the probe
    // measures the whole trigger, scan included.
    def runFanout(nDest: Int): Unit = {
      val rows = spark.read.parquet(s"$base/documents.parquet")
        .select(col("doc_id").as("doc"), col("text"))
      val srcDir = tmp("sscale66-src-")
      writeOddBatches(rows, srcDir): Unit
      val ckptRoot = tmp("sscale66-ckpt-")
      val pm = new PipelineManager(spark, ckptRoot)
      val destRoots = (0 until nDest).map { i =>
        val root = tmp(s"sscale66-d$i-")
        pm.create(graft.model.PipelineSpec(s"fan$i", "parquet", "parquet",
          srcDir, destinationConnection = root + "/d",
          metadata = Map("maxFilesPerTrigger" -> "1")))
        root
      }
      val epochSecs = scala.collection.mutable.ArrayBuffer.empty[Double]
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.name == "group-fan0" && e.progress.numInputRows > 0) {
            val dt = e.progress.durationMs.get("triggerExecution").toDouble / 1e3
            epochSecs += dt
            println(f"[sscale] fanout dest=$nDest epoch=${e.progress.batchId} " +
              f"${dt}%.2fs heap=${heapMb}MB")
          }
      }
      spark.streams.addListener(listener)
      pm.startGroup("fan0", identity).awaitTermination()
      spark.streams.removeListener(listener)
      pm.close()
      val n = epochSecs.size
      val head = epochSecs.take(3); val tail = epochSecs.takeRight(3)
      println(f"[sscale] fanout dest=$nDest SUMMARY epochs=$n " +
        f"batchDocs=$batchDocs mean=${epochSecs.sum / n}%.3fs " +
        f"first3_mean=${head.sum / head.size}%.3fs " +
        f"last3_mean=${tail.sum / tail.size}%.3fs " +
        f"late_over_early=${(tail.sum / tail.size) / (head.sum / head.size)}%.2f")
      deleteAll(srcDir +: ckptRoot +: destRoots: _*)
    }

    // ---- s22 shape: streaming HLL register merge ----
    // State is structurally bounded (256 rows whatever the history);
    // flat per-epoch cost at 8× the epoch count confirms the only
    // variable work is the batch's own register build.
    def runHll(dir: String, label: String): Unit = {
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("doc"), col("text"))
      val srcDir = tmp("sscale22-src-"); val regDir = tmp("sscale22-reg-")
      val outDir = tmp("sscale22-out-"); val ckpt = tmp("sscale22-ckpt-")
      writeOddBatches(rows, srcDir): Unit
      drive("s22shape", label, srcDir, ckpt, rows.schema, identity) { (batch, epoch) =>
        val sh = batch.select(graft.text.Text.tokens(col("text")).as("w"))
          .select(explode(graft.text.Text.shinglesOf(col("w"))).as("sh"))
        val bregs = graft.sketch.Sketch.hllRegisters(sh, col("sh"))
        val priorFiles = new java.io.File(regDir).listFiles()
        val merged = (if (priorFiles != null &&
            priorFiles.exists(_.getName.startsWith("part-")))
          spark.read.parquet(regDir).unionByName(bregs) else bregs)
          .groupBy(col("reg")).agg(max(col("mj")).as("mj"))
          .localCheckpoint()
        merged.coalesce(1).write.mode("overwrite").parquet(regDir)
        PipelineManager.epochAppend(
          graft.sketch.Sketch.hllEstimate(merged)
            .withColumn("epoch", lit(epoch)).coalesce(1),
          outDir, epoch, "sscale-hll"): Unit
      }
      deleteAll(srcDir, regDir, outDir, ckpt)
    }

    // ---- s23 shape: incremental lexical index + standing query ----
    // The accumulator is O(1) and the append O(batch); the one
    // component that grows is the standing query's own posting-list
    // read (|q| terms) — the probe measures that slope directly, the
    // honest serving cost as opposed to a corpus rescan.
    def runLexIndex(dir: String, label: String): Unit = {
      val terms = Seq("vector", "customer", "merge", "scan")
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("doc"), col("text"))
      val srcDir = tmp("sscale23-src-"); val idxDir = tmp("sscale23-idx-")
      val outDir = tmp("sscale23-out-"); val ckpt = tmp("sscale23-ckpt-")
      writeOddBatches(rows, srcDir): Unit
      drive("s23shape", label, srcDir, ckpt, rows.schema, identity) { (batch, epoch) =>
        val btok = batch.select(col("doc").as("doc_id"),
          graft.text.Text.tokens(col("text")).as("w"))
        val bdl = btok.select(col("doc_id"),
          size(col("w")).cast("double").as("dl"))
        val bpost = btok.select(col("doc_id"), explode(col("w")).as("term"))
          .filter(col("term").isin(terms: _*))
          .groupBy(col("doc_id"), col("term"))
          .agg(count(lit(1)).cast("double").as("tf"))
          .join(bdl, "doc_id")
        PipelineManager.epochAppend(bpost.coalesce(1),
          s"$idxDir/postings", epoch, "sscale-lxp"): Unit
        val statsPath = s"$idxDir/stats"
        val statFiles = Option(new java.io.File(statsPath).listFiles())
          .getOrElse(Array.empty)
        val existing =
          if (statFiles.exists(f => f.getName.startsWith("graft-") &&
              f.getName.endsWith(".parquet")))
            spark.read.parquet(statsPath).collect()
          else Array.empty[org.apache.spark.sql.Row]
        val (nd, sumDl) = existing.find(_.getLong(0) == epoch) match {
          case Some(r) => (r.getDouble(1), r.getDouble(2))
          case None =>
            val prior = existing.filter(_.getLong(0) < epoch)
              .sortBy(-_.getLong(0)).headOption
            val b = bdl.agg(count(lit(1)).cast("double"),
              coalesce(sum(col("dl")), lit(0.0))).head()
            (prior.map(_.getDouble(1)).getOrElse(0.0) + b.getDouble(0),
              prior.map(_.getDouble(2)).getOrElse(0.0) + b.getDouble(1))
        }
        import spark.implicits._
        PipelineManager.epochAppend(
          Seq((epoch, nd, sumDl)).toDF("epoch", "nd", "sum_dl").coalesce(1),
          statsPath, epoch, "sscale-lxs"): Unit
        val avgdl = sumDl / nd
        val post = spark.read.parquet(s"$idxDir/postings")
        val dfT = post.groupBy(col("term"))
          .agg(count(lit(1)).cast("double").as("df"))
        val wExpr = log((lit(nd) - col("df") + 0.5) /
            (col("df") + 0.5) + 1) * col("tf") * 2.2 /
          (col("tf") + lit(1.2) *
            (lit(1) - 0.75 + lit(0.75) * col("dl") / lit(avgdl)))
        val scored = post.join(broadcast(dfT), "term")
          .groupBy(col("doc_id")).agg(round(sum(wExpr), 6).as("score"))
        PipelineManager.epochAppend(
          scored.orderBy(col("score").desc, col("doc_id")).limit(3)
            .withColumn("epoch", lit(epoch)).coalesce(1),
          outDir, epoch, "sscale-lxq"): Unit
      }
      deleteAll(srcDir, idxDir, outDir, ckpt)
    }

    // ---- s24 shape: full-vocab incremental lexical index ----
    // The two bounds under test: per-epoch cost flat (append is
    // O(batch), serve reads |q|-term postings through a bounded view)
    // and FILE COUNT flat (compaction rewrites one-file-per-bucket
    // every 8 epochs) — both independent of how many epochs ran.
    def runLexVocab(dir: String, label: String): Unit = {
      val qTerms = Seq("table", "stream", "window", "sort")
      val rows = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id").as("doc"), col("text"))
      val srcDir = tmp("sscale24-src-"); val idxDir = tmp("sscale24-idx-")
      val outDir = tmp("sscale24-out-"); val ckpt = tmp("sscale24-ckpt-")
      writeOddBatches(rows, srcDir): Unit
      val ilx = new graft.streaming.IncrementalLexIndex(spark, idxDir,
        name = "sscale24", compactEvery = 8)
      val files = scala.collection.mutable.ArrayBuffer.empty[Int]
      drive("s24shape", label, srcDir, ckpt, rows.schema, identity,
          postEpoch = () => files += ilx.postingsFileCount()) { (batch, epoch) =>
        ilx.appendEpoch(batch.withColumnRenamed("doc", "doc_id"), epoch)
        PipelineManager.epochAppend(
          ilx.serve(qTerms, 3).withColumn("epoch", lit(epoch)).coalesce(1),
          outDir, epoch, "sscale-lxv"): Unit
      }
      println(s"[sscale] s24shape $label FILES first=${files.head} " +
        s"max=${files.max} last=${files.last} n=${files.size}")
      // write-cost telemetry: epochs-rewritten is Σ per merge of the
      // raw epochs it covers — the old full-store rewrite on the same
      // cadence would be Σ_tick(ticks seen so far)·compactEvery ≈
      // n²/(2·compactEvery), the quadratic this bounds
      val st = ilx.postingsStore
      val n = files.size
      println(s"[sscale] s24shape $label REWRITE " +
        s"epochsRewritten=${st.totalEpochsRewritten} " +
        s"fullRewriteAlt=${(n.toLong * n) / 16} " +
        s"bytes=${st.totalRewriteBytes}")
      deleteAll(srcDir, idxDir, outDir, ckpt)
    }

    if (shapes("s24")) {
      runLexVocab(base, "1x"); runLexVocab(scaled, s"${factor}x")
    }

    // ---- s26 shape: incremental IVF vector index ----
    // Same two bounds as s24, on the vector store: per-epoch cost
    // flat (assignment is O(batch) against a broadcast codebook,
    // serve reads nprobe cells through the bounded view) and file
    // count flat (compaction to ~one file per cell every 8 epochs).
    // The embeddings corpus has no 8× variant, so the deeper run
    // replays the same corpus in QUARTER-sized batches (4× the
    // epochs) — the axis under test is epoch count, not bytes.
    def runIvf(batchFrac: Int, label: String): Unit = {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
        .select(col("vec_id").as("doc"), col("embedding"))
      val cents = emb.filter(col("doc") < 8)
        .select(col("doc").as("cent_id"),
          graft.ann.Ann.toDouble(col("embedding")).as("ce"))
      val probes = emb.filter(col("doc") < 4)
        .select(col("doc").as("vec_id"), col("embedding")).localCheckpoint()
      val srcDir = tmp("sscale26-src-"); val idxDir = tmp("sscale26-idx-")
      val outDir = tmp("sscale26-out-"); val ckpt = tmp("sscale26-ckpt-")
      val effectiveDocs = math.max(1, batchDocs / batchFrac)
      writeOddBatches(emb, srcDir, docsPerBatch = effectiveDocs): Unit
      val ivx = new graft.streaming.IncrementalVectorIndex(spark, idxDir,
        cents, name = "sscale26", compactEvery = 8)
      val files = scala.collection.mutable.ArrayBuffer.empty[Int]
      drive("s26shape", label, srcDir, ckpt, emb.schema, identity,
          docsLabel = effectiveDocs,
          postEpoch = () => files += ivx.cellFileCount()) { (batch, epoch) =>
        ivx.appendEpoch(batch.withColumnRenamed("doc", "vec_id"), epoch)
        PipelineManager.epochAppend(
          ivx.serve(probes, k = 3, nprobe = 2)
            .withColumn("epoch", lit(epoch)).coalesce(1),
          outDir, epoch, "sscale-ivf"): Unit
      }
      println(s"[sscale] s26shape $label FILES first=${files.head} " +
        s"max=${files.max} last=${files.last} n=${files.size} " +
        s"batchDocs=$effectiveDocs")
      val st = ivx.cellStore
      val n = files.size
      println(s"[sscale] s26shape $label REWRITE " +
        s"epochsRewritten=${st.totalEpochsRewritten} " +
        s"fullRewriteAlt=${(n.toLong * n) / 16} " +
        s"bytes=${st.totalRewriteBytes}")
      deleteAll(srcDir, idxDir, outDir, ckpt)
    }

    if (shapes("s26")) { runIvf(1, "1x"); runIvf(4, "4xepochs") }

    if (shapes("fanout")) { runFanout(2); runFanout(8) }
    if (shapes("s22")) { runHll(base, "1x"); runHll(scaled, s"${factor}x") }
    if (shapes("s23")) {
      runLexIndex(base, "1x"); runLexIndex(scaled, s"${factor}x")
    }

    if (shapes("s15")) {
      runIndexDedup(base, "1x"); runIndexDedup(scaled, s"${factor}x")
    }
    if (shapes("s14")) {
      runWatermarkDedup(base, "1x"); runWatermarkDedup(scaled, s"${factor}x")
    }
    if (shapes("s20")) {
      val benchDir = tmp("sscale20-bench-")
      val baseRows = bandRows(base)
      baseRows.filter(pmod(col("doc"), lit(2L)) === 0 && col("band").isNotNull)
        .coalesce(1).write.mode("overwrite").parquet(benchDir)
      baseRows.unpersist(true)
      runDecontam(base, "1x", benchDir)
      runDecontam(scaled, s"${factor}x", benchDir)
      deleteAll(benchDir)
    }
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
