package graft.sources

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** F2/A4 at the source layer: paused partitions' offsets hold (their
  * data is never read), resume delivers the held range exactly once. */
class PausableSourceSpec extends SparkTestBase {

  test("latestOffset holds paused components and advances the rest") {
    val pauseFile = Files.createTempFile("graft-pause-", ".txt")
    Files.writeString(pauseFile, "1, 3")
    val stream = new PausableStream(rows = 100, parts = 4, batchPer = 30,
      size = 4, pauseFile = pauseFile.toString)
    // the admitted row budget (batchPer × parts = 120) is shared by
    // the ACTIVE partitions only — 2 of 4 paused means the other two
    // advance by 60, not 30 (pause must not halve throughput)
    val o1 = stream.latestOffset(stream.initialOffset(),
      stream.getDefaultReadLimit).asInstanceOf[VectorOffset]
    assert(o1.next == IndexedSeq(60L, 0L, 60L, 0L))
    // reconciliation picks up an edited pause set before the next poll
    Files.writeString(pauseFile, "")
    val o2 = stream.latestOffset(o1, stream.getDefaultReadLimit)
      .asInstanceOf[VectorOffset]
    assert(o2.next == IndexedSeq(90L, 30L, 90L, 30L))
    // offsets never regress, clamp at the target
    val o3 = stream.latestOffset(VectorOffset(IndexedSeq(95L, 100L, 100L, 100L)),
      stream.getDefaultReadLimit).asInstanceOf[VectorOffset]
    assert(o3.next == IndexedSeq(100L, 100L, 100L, 100L))
    assert(stream.deserializeOffset("5,0,9,100") ==
      VectorOffset(IndexedSeq(5L, 0L, 9L, 100L)))
  }

  test("planInputPartitions reads only advanced partitions") {
    val stream = new PausableStream(rows = 100, parts = 3, batchPer = 10,
      size = 4, pauseFile = "")
    val slices = stream.planInputPartitions(
        VectorOffset(IndexedSeq(0L, 5L, 9L)),
        VectorOffset(IndexedSeq(10L, 5L, 12L)))
      .map(_.asInstanceOf[PausableSlice])
    assert(slices.map(s => (s.partition, s.lo, s.hi)).toSet ==
      Set((0, 0L, 10L), (2, 9L, 12L)))
    // a checkpoint from a different partition count fails loudly
    intercept[IllegalArgumentException] {
      stream.planInputPartitions(VectorOffset(IndexedSeq(0L)),
        VectorOffset(IndexedSeq(1L)))
    }
  }

  test("pause survives a run; resume delivers the held range exactly once") {
    val ckpt = Files.createTempDirectory("graft-pausable-ckpt").toString
    val pauseFile = Files.createTempFile("graft-pause-", ".txt")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long)]()
    def drain(run: Int): Unit = {
      val q = spark.readStream
        .format(classOf[PausableProvider].getName)
        .option("rowsPerPartition", "50")
        .option("numPartitions", "3")
        .option("batchPerPartition", "20")
        .option("payloadSize", "4")
        .option("pauseFile", pauseFile.toString)
        .load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, _: Long) =>
          batch.collect().foreach(r => out.add((run, r.getInt(0), r.getLong(1))))
        }
        .start()
      q.awaitTermination()
    }

    import scala.jdk.CollectionConverters._
    Files.writeString(pauseFile, "1")
    drain(1)
    val afterRun1 = out.asScala.toSeq
    assert(afterRun1.forall(_._2 != 1), "paused partition must deliver nothing")
    assert(afterRun1.count(_._2 == 0) == 50 && afterRun1.count(_._2 == 2) == 50)

    // an idempotent re-run with the same pause set delivers nothing new
    drain(2)
    assert(out.asScala.count(_._1 == 2) == 0)

    // resume: the held partition drains from index 0, others stay put
    Files.writeString(pauseFile, "")
    drain(3)
    val all = out.asScala.toSeq
    val run3 = all.filter(_._1 == 3)
    assert(run3.forall(_._2 == 1) && run3.map(_._3).sorted == (0L until 50L))
    // exactly once across the whole history
    assert(all.map(r => (r._2, r._3)).distinct.size == 150 && all.size == 150)
  }
}
