package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.text.Text

/** The full-vocabulary incremental lexical index: serve equals the
  * batch closed form over every ingested prefix, compaction keeps the
  * file count flat without changing results, and every crash window
  * of the compaction protocol re-opens exactly once-committed. */
class IncrementalLexIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def docs: DataFrame =
    spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))

  /** Terms deliberately NOT special-cased anywhere at ingest. */
  private val qTerms = Seq("table", "stream", "window", "sort")

  private def tmp(tag: String): String =
    Files.createTempDirectory(tag).toString

  private def serveRows(ilx: IncrementalLexIndex): Seq[(Long, Long, Double)] =
    ilx.serve(qTerms, 5).as[(Long, Long, Double)].collect().toSeq

  private def oracleRows(prefix: DataFrame): Seq[(Long, Long, Double)] =
    Text.bm25TopK(prefix, qTerms, 5).as[(Long, Long, Double)].collect().toSeq

  test("serve matches the batch closed form on every prefix; compaction keeps files flat") {
    val dir = tmp("ilx-")
    val ilx = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 2)
    val fileCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until 6).foreach { e =>
      ilx.appendEpoch(docs.filter(pmod(col("doc_id"), lit(6L)) === e), e)
      fileCounts += ilx.postingsFileCount()
      assert(serveRows(ilx) ==
        oracleRows(docs.filter(pmod(col("doc_id"), lit(6L)) <= e)),
        s"epoch $e serve diverged from the batch closed form")
    }
    // compaction ran after epochs 1, 3, 5: at each of those points
    // the store must sit at its compacted floor — at most one file
    // per term-hash bucket (the repartition-by-bucket write), never
    // the accumulated epochs' worth. Flatness in epoch count IS the
    // claim: counts at epochs 1, 3, 5 must not grow.
    for (e <- Seq(1, 3, 5))
      assert(fileCounts(e) <= Text.LexIndexBuckets,
        s"store not at its compacted floor after epoch $e: $fileCounts")
    assert(fileCounts(5) <= fileCounts(1),
      s"compacted floor grew with epoch count: $fileCounts")
    // the stats store is swept too: cumulative rows below the
    // compaction point are subsumed by the row at it
    assert(PipelineManager.committedFiles(s"$dir/stats",
        spark.sparkContext.hadoopConfiguration).size <= 2,
      "stats store must not grow one file per epoch across compactions")
  }

  test("an index with no documents yet serves an empty result, not a crash") {
    val dir = tmp("ilx-empty-")
    // compactEvery=1: every data-free epoch also ticks the compaction
    // cadence, which must no-op on an empty store rather than die on
    // an uninferrable-schema read
    val ilx = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 1)
    assert(serveRows(ilx).isEmpty, "fresh index must serve empty")
    ilx.appendEpoch(docs.limit(0), 0L) // a data-free first trigger
    assert(serveRows(ilx).isEmpty, "empty-epoch index must serve empty")
    ilx.appendEpoch(docs.limit(50), 1L)
    assert(serveRows(ilx) == oracleRows(docs.limit(50)))
  }

  test("a legacy root-level compaction record migrates instead of deleting data") {
    // builds prior to the EpochPartitionedStore extraction kept
    // _compact_state-* at the index ROOT; a reopen must move the
    // record into the store, not read "no generation recorded" and
    // sweep the compacted data as an unrecorded attempt
    val dir = tmp("ilx-mig-")
    val ilx = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 2)
    (0 until 2).foreach { e =>
      ilx.appendEpoch(docs.filter(pmod(col("doc_id"), lit(2L)) === e), e)
    }
    val want = serveRows(ilx)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // simulate the legacy layout: record back at the root
    assert(fs.rename(
      new org.apache.hadoop.fs.Path(s"$dir/postings/_compact_state-1"),
      new org.apache.hadoop.fs.Path(s"$dir/_compact_state-1")))
    val reopened = new IncrementalLexIndex(spark, dir, name = "t")
    assert(serveRows(reopened) == want,
      "legacy record must be honored — data survived the reopen")
    assert(fs.exists(
      new org.apache.hadoop.fs.Path(s"$dir/postings/_compact_state-1")),
      "the record must have migrated into the store")
  }

  test("a replayed epoch (and a replayed compaction trigger) is a no-op") {
    val dir = tmp("ilx-rp-")
    val ilx = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 2)
    ilx.appendEpoch(docs.filter(pmod(col("doc_id"), lit(3L)) === 0), 0L)
    ilx.appendEpoch(docs.filter(pmod(col("doc_id"), lit(3L)) === 1), 1L)
    val before = serveRows(ilx)
    // replay epoch 1 with DIFFERENT (poisoned) data: the committed
    // epoch must win everywhere — postings, stats, compaction trigger
    ilx.appendEpoch(docs.limit(7).withColumn("text", lit("table table")), 1L)
    assert(serveRows(ilx) == before, "replayed epoch changed the index")
    assert(before ==
      oracleRows(docs.filter(pmod(col("doc_id"), lit(3L)) <= 1)))
  }

  test("recovery rolls back an unrecorded compaction and completes a recorded one") {
    val dir = tmp("ilx-rc-")
    val ilx = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 2)
    (0 until 4).foreach { e =>
      ilx.appendEpoch(docs.filter(pmod(col("doc_id"), lit(4L)) === e), e)
    }
    val want = oracleRows(docs)
    assert(serveRows(ilx) == want)
    val fs = new org.apache.hadoop.fs.Path(dir)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    // crash window A: a generation's data + marker landed but its
    // state record did not (crash between commit and record).
    // Fabricate exactly that: publish a gen-5 rewrite of the current
    // store with NO record. Without rollback the store holds every
    // row twice and every score doubles.
    val full = spark.read.parquet(s"$dir/postings").repartition(col("tb"))
    PipelineManager.epochAppendPartitioned(
      full, s"$dir/postings", "tb", 5L, "t.g"): Unit
    val reopened = new IncrementalLexIndex(spark, dir, name = "t")
    assert(serveRows(reopened) == want,
      "recovery must delete an unrecorded generation (else scores double)")
    // crash window B: record landed, sweep may not have finished — a
    // fresh open re-runs the recorded sweep (idempotent) and serves
    // the same rows. Drive a real gen 5 (two more epochs, empty
    // batches so the corpus is unchanged), then re-open.
    val ilx2 = new IncrementalLexIndex(spark, dir, name = "t",
      compactEvery = 2)
    ilx2.appendEpoch(docs.limit(0), 4L)
    ilx2.appendEpoch(docs.limit(0), 5L) // triggers gen 5 for real
    assert(fs.exists(new org.apache.hadoop.fs.Path(
      s"$dir/postings/_compact_state-5")))
    val ilx3 = new IncrementalLexIndex(spark, dir, name = "t")
    assert(serveRows(ilx3) == want)
  }
}
