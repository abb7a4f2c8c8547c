package graft.streaming

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/**
 * Pins the dropDuplicatesWithinWatermark state machine on the key
 * shape the gated s12 query cannot exercise: a key that does NOT carry
 * its event time. There a later duplicate can have a newer event time
 * than the first occurrence's expiry, so all three behaviors are
 * observable:
 *
 *  - a duplicate arriving while the first occurrence's state is live
 *    is DEDUPED (dropped);
 *  - a duplicate arriving after the watermark passed the first
 *    occurrence's eviction point (event time + delay) but at/above the
 *    current watermark RE-EMITS — the documented "guaranteed only
 *    within the delay" caveat;
 *  - a duplicate below the watermark is dropped as late regardless of
 *    state.
 *
 * One row per key per batch keeps the state expiry deterministic
 * (expiry is set by the first processed row's event time). Harness =
 * the s12 shape: one AvailableNow run per file over a shared
 * checkpoint, default no-data-batch schedule (the trailing batch
 * persists the advanced watermark and sweeps expired entries).
 */
class DedupWithinWatermarkContractSpec extends SparkTestBase {

  private def ts(s: String) = Timestamp.valueOf(s)

  test("within-watermark dedup: live dup drops, dead-state dup re-emits, " +
      "late dup stays dropped") {
    import spark.implicits._
    val srcDir = Files.createTempDirectory("graft-ddw-src-").toString
    val ckpt = Files.createTempDirectory("graft-ddw-ckpt-").toString

    // wm(batch1) = 10:00 - 30m = 09:30; wm(batch2) = 13:00 - 30m = 12:30.
    val batches = Seq(
      Seq((1L, ts("2026-01-01 10:00:00")),   // first occurrence → emits
        (9L, ts("2026-01-01 10:00:00"))),    // watermark anchor
      Seq((1L, ts("2026-01-01 10:10:00")),   // state live (expiry 10:30 ≥ 09:30) → deduped
        (8L, ts("2026-01-01 13:00:00"))),    // advances watermark → emits
      Seq((1L, ts("2026-01-01 12:40:00")),   // state died (10:30 < 12:30), not late → RE-EMITS
        (7L, ts("2026-01-01 11:00:00"))))    // late (11:00 < 12:30) → dropped

    val schema = batches.head.toDF("user_id", "ts").schema
    val sink = scala.collection.mutable.ArrayBuffer[(Long, Timestamp)]()

    batches.foreach { rows =>
      rows.toDF("user_id", "ts")
        .coalesce(1).write.mode(SaveMode.Append).parquet(srcDir)
      val deduped = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
        .withWatermark("ts", "30 minutes")
        .dropDuplicatesWithinWatermark("user_id")
      val q = deduped.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          val got = batch.as[(Long, Timestamp)].collect()
          sink.synchronized { sink ++= got }
          ()
        }
        .start()
      q.awaitTermination()
    }

    val out = sink.synchronized(sink.toSet)
    assert(out === Set(
      (1L, ts("2026-01-01 10:00:00")),
      (9L, ts("2026-01-01 10:00:00")),
      (8L, ts("2026-01-01 13:00:00")),
      (1L, ts("2026-01-01 12:40:00"))),
      "the within-watermark dedup state machine changed — revisit the " +
        "s12 oracle's admission/expiry model")
  }
}
