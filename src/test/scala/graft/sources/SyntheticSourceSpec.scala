package graft.sources

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.connector.read.streaming.ReadLimit
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** S8 synthetic source: admission pacing, offset resume, determinism. */
class SyntheticSourceSpec extends SparkTestBase {

  test("payload is deterministic and fixed-size") {
    assert(SyntheticSource.payloadFor(7, 4) == "event-000000000007-xxxx")
    assert(SyntheticSource.payloadFor(7, 4).length ==
      SyntheticSource.payloadFor(99999, 4).length)
    // fixed size must survive indices past 1e8 (the %08d overflow point)
    assert(SyntheticSource.payloadFor(7, 4).length ==
      SyntheticSource.payloadFor(123456789012L, 4).length)
  }

  test("admission control paces batches and clamps at the target") {
    val stream = new SyntheticStream(total = 600, batch = 250, size = 4, parts = 2)
    def next(from: Long): Long =
      stream.latestOffset(SyntheticOffset(from), stream.getDefaultReadLimit)
        .asInstanceOf[SyntheticOffset].n
    assert(next(0) == 250 && next(250) == 500 && next(500) == 600 && next(600) == 600)
    // a restored offset mid-range continues from exactly there
    assert(next(337) == 587)
    // a checkpoint drained PAST this run's target must never rewind the
    // offset log (rewinding would duplicate events on a later run)
    assert(next(900) == 900)
    assert(stream.deserializeOffset("42") == SyntheticOffset(42))
  }

  test("planInputPartitions slices the index range disjointly") {
    val stream = new SyntheticStream(total = 100, batch = 100, size = 1, parts = 4)
    val parts = stream.planInputPartitions(SyntheticOffset(10), SyntheticOffset(20))
      .map(_.asInstanceOf[SyntheticPartition])
    assert(parts.map(p => p.hi - p.lo).sum == 10)
    assert(parts.map(p => p.lo until p.hi).flatten.sorted.toSeq == (10L until 20L))
    assert(stream.planInputPartitions(SyntheticOffset(5), SyntheticOffset(5)).isEmpty)
  }

  test("AvailableNow drains in paced batches and a reused checkpoint resumes") {
    val ckpt = Files.createTempDirectory("graft-synth-ckpt").toString
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Long, Long)]()
    def drain(total: Long): Unit = {
      val q = spark.readStream
        .format(classOf[SyntheticProvider].getName)
        .option("totalEvents", total.toString)
        .option("batchSize", "100")
        .option("payloadSize", "8")
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          batch.collect().foreach(r => out.add((epoch, r.getLong(0))))
        }
        .start()
      q.awaitTermination()
    }
    drain(250)
    val firstRun = out.size()
    assert(firstRun == 250, s"run 1 must emit [0,250), got $firstRun rows")
    drain(400)
    import scala.jdk.CollectionConverters._
    val rows = out.asScala.toSeq
    assert(rows.map(_._2).sorted == (0L until 400L),
      "resume must continue at the checkpointed index: no dups, no gaps")
    // pacing: no epoch carries more than batchSize rows
    assert(rows.groupBy(_._1).values.forall(_.size <= 100))
    assert(rows.groupBy(_._1).size >= 5, "250/100 + 150/100 => at least 5 batches")
  }
}
