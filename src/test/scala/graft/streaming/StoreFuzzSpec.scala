package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Randomized interleaving fuzzer for [[EpochPartitionedStore]] — the
 * persistence core under the s24/s26/s27 incremental indexes. A
 * seeded op stream drives appends, poisoned replays, re-opens
 * (recovery), and simulated compaction crashes against an in-memory
 * model of what the store must contain; after EVERY op the store's
 * rows must equal the model exactly. The deterministic crash-window
 * tests pin each protocol transition one at a time; this pins their
 * COMPOSITIONS (replay after crash after compact after reopen...),
 * which is where the lock fuzzers found their bugs in rounds 13-14.
 */
class StoreFuzzSpec extends SparkTestBase {
  import spark.implicits._

  private val genPipe = "fz.g" // the store's generation namespace for name="fz"

  test("seeded op streams: store contents always equal the model") {
    for (seed <- Seq(11, 42, 97)) {
      val rnd = new scala.util.Random(seed)
      val dir = Files.createTempDirectory(s"sfz-$seed-").toString
      var store = new EpochPartitionedStore(spark, dir, "pc", "fz",
        refreshEvery = 3, compactEvery = 3)
      // model: first committed rows per epoch; replays never change it
      val model = scala.collection.mutable.Map.empty[Long, Seq[(Long, String, Int)]]
      var nextEpoch = 0L

      def rows(epoch: Long, poison: Boolean): Seq[(Long, String, Int)] = {
        val n = rnd.nextInt(6) // 0..5 rows; 0 = an empty epoch
        (0 until n).map { i =>
          (epoch * 100 + i,
            if (poison) s"POISON-$epoch-$i" else s"v-$epoch-$i",
            rnd.nextInt(4))
        }
      }

      def storeRows(): Seq[(Long, String, Int)] =
        store.frameIfAny match {
          case None => Nil
          case Some(fr) => fr.select(col("id"), col("v"),
              col("pc").cast("int")).as[(Long, String, Int)].collect().toSeq
        }

      def check(opLabel: String): Unit = {
        val want = model.values.flatten.toSeq.sorted
        val got = storeRows().sorted
        assert(got == want,
          s"seed=$seed after $opLabel: store diverged from model " +
            s"(${got.size} vs ${want.size} rows)")
      }

      (0 until 28).foreach { step =>
        rnd.nextInt(100) match {
          case r if r < 50 => // new epoch
            val e = nextEpoch; nextEpoch += 1
            val rs = rows(e, poison = false)
            store.appendEpoch(
              rs.toDF("id", "v", "pc").coalesce(1), e)
            model(e) = rs
            check(s"append($e)")
          case r if r < 70 && nextEpoch > 0 => // poisoned replay
            val e = rnd.nextInt(nextEpoch.toInt).toLong
            store.appendEpoch(
              rows(e, poison = true).toDF("id", "v", "pc").coalesce(1), e)
            check(s"replay($e)")
          case r if r < 85 => // process restart: fresh open, recovery
            store = new EpochPartitionedStore(spark, dir, "pc", "fz",
              refreshEvery = 3, compactEvery = 3)
            check("reopen")
          case _ => // compaction crashed before its state record, then
            // the process died: publish an unrecorded generation over
            // the current contents and re-open — recovery must roll it
            // back (its inputs are still present), never double rows
            if (store.hasData) {
              val gen = nextEpoch + 1000 + step // beyond any real epoch
              PipelineManager.epochAppendPartitioned(
                spark.read.parquet(dir).repartition(col("pc")),
                dir, "pc", gen, genPipe): Unit
              store = new EpochPartitionedStore(spark, dir, "pc", "fz",
                refreshEvery = 3, compactEvery = 3)
              check(s"crashed-compaction($gen)+reopen")
            }
        }
      }
      // end-state: one more reopen and a final exact check, plus the
      // file-count bound compaction exists for (4 partition values,
      // refresh/compact cadence 3 -> never more than a few epochs of
      // un-compacted files per partition)
      store = new EpochPartitionedStore(spark, dir, "pc", "fz",
        refreshEvery = 3, compactEvery = 3)
      check("final-reopen")
      assert(store.fileCount <= 4 * 4,
        s"seed=$seed: file count ${store.fileCount} not bounded by compaction")
    }
  }
}
