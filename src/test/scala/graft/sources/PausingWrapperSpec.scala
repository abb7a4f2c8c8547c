package graft.sources

import java.nio.file.Files

import graft.SparkTestBase

/** SURVEY §7.3 hard part 1 for FOREIGN sources: the offset-layer
  * wrapper holds per-partition components of a source that knows
  * nothing about pausing, and the Kafka offset codec reshapes the
  * public KafkaSourceOffset JSON losslessly. */
class PausingWrapperSpec extends SparkTestBase {

  test("wrapper holds paused components of a pause-unaware source") {
    val pauseFile = Files.createTempFile("graft-wrap-pause-", ".txt")
    // the "foreign" source: a PausableStream with NO pause file of its
    // own — it always proposes a full advance
    val foreign = new PausableStream(rows = 100, parts = 4, batchPer = 30,
      size = 4, pauseFile = "")
    val wrapped = new PausingMicroBatchStream(foreign, VectorOffsetCodec,
      pauseFile.toString)

    Files.writeString(pauseFile, "1, 3")
    val o1 = wrapped.latestOffset(wrapped.initialOffset(),
      wrapped.getDefaultReadLimit).asInstanceOf[VectorOffset]
    // inner proposes 30 everywhere; the wrapper clamps 1 and 3 back
    assert(o1.next == IndexedSeq(30L, 0L, 30L, 0L))

    // reconciliation: clearing the file releases the held range
    Files.writeString(pauseFile, "")
    val o2 = wrapped.latestOffset(o1, wrapped.getDefaultReadLimit)
      .asInstanceOf[VectorOffset]
    assert(o2.next == IndexedSeq(60L, 30L, 60L, 30L))

    // a stray token matches no component and holds nothing
    Files.writeString(pauseFile, "banana")
    val o3 = wrapped.latestOffset(o2, wrapped.getDefaultReadLimit)
      .asInstanceOf[VectorOffset]
    assert(o3.next == IndexedSeq(90L, 60L, 90L, 60L))

    // plan/reader delegate to the inner source untouched
    assert(wrapped.planInputPartitions(o2, o3).length == 4)
  }

  test("vector codec round-trips and merge inverts split") {
    val j = "12,0,3"
    assert(VectorOffsetCodec.split(j) ==
      Map("0" -> "12", "1" -> "0", "2" -> "3"))
    assert(VectorOffsetCodec.merge(VectorOffsetCodec.split(j)) == j)
  }

  test("provider wrapper drives a real query; pause survives a restart") {
    import org.apache.spark.sql.DataFrame
    import org.apache.spark.sql.streaming.Trigger
    val ckpt = Files.createTempDirectory("graft-wrap-ckpt").toString
    val pauseFile = Files.createTempFile("graft-wrap-pause-", ".txt")
    val out = new java.util.concurrent.ConcurrentLinkedQueue[(Int, Int, Long)]()
    def drain(run: Int): Unit = {
      val q = spark.readStream
        .format(classOf[PausingProvider].getName)
        .option("innerFormat", classOf[PausableProvider].getName)
        .option("offsetCodec", "vector")
        .option("pauseFile", pauseFile.toString)
        // inner source options pass through untouched; its OWN pause
        // file stays unset — the inner source is pause-unaware here
        .option("rowsPerPartition", "50")
        .option("numPartitions", "3")
        .option("batchPerPartition", "20")
        .option("payloadSize", "4")
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
    assert(afterRun1.forall(_._2 != 1), "paused component must deliver nothing")
    assert(afterRun1.count(_._2 == 0) == 50 && afterRun1.count(_._2 == 2) == 50)
    // unpause + restart from the same checkpoint: the held range
    // drains exactly once
    Files.writeString(pauseFile, "")
    drain(2)
    val all = out.asScala.toSeq
    val run2 = all.filter(_._1 == 2)
    assert(run2.forall(_._2 == 1) && run2.map(_._3).sorted == (0L until 50L))
    assert(all.map(r => (r._2, r._3)).distinct.size == 150 && all.size == 150)
  }

  test("kafka codec reshapes the public KafkaSourceOffset JSON") {
    val j = """{"topicA":{"0":123,"1":45},"topic-B":{"2":7}}"""
    val parts = KafkaOffsetCodec.split(j)
    assert(parts == Map("topicA-0" -> "123", "topicA-1" -> "45",
      "topic-B-2" -> "7"))
    // merge is split's inverse (canonical key order)
    assert(KafkaOffsetCodec.split(KafkaOffsetCodec.merge(parts)) == parts)
    // holding one component preserves the others through a merge
    val held = parts.updated("topicA-1", "40")
    assert(KafkaOffsetCodec.split(KafkaOffsetCodec.merge(held)) == held)
  }

  test("innerFormat resolves only through the server-side allowlist") {
    import org.apache.spark.sql.util.CaseInsensitiveStringMap
    // engine-authored providers are pre-registered
    assert(PausingProvider.resolveInner(classOf[PausableProvider].getName)
      .isInstanceOf[PausableProvider])
    // an arbitrary classpath class is rejected BEFORE any reflection
    val e = intercept[IllegalArgumentException] {
      PausingProvider.resolveInner("java.lang.ProcessBuilder")
    }
    assert(e.getMessage.contains("not a registered inner provider"))
    // registering a non-TableProvider still fails the type check
    // (unregister in finally: the allowlist is process-global)
    PausingProvider.register("java.lang.StringBuilder")
    try {
      val e2 = intercept[IllegalArgumentException] {
        PausingProvider.resolveInner("java.lang.StringBuilder")
      }
      assert(e2.getMessage.contains("not a TableProvider"))
    } finally PausingProvider.unregister("java.lang.StringBuilder")
    // the provider path itself enforces it (option wiring)
    val opts = new java.util.HashMap[String, String]()
    opts.put("innerFormat", "java.lang.ProcessBuilder")
    intercept[IllegalArgumentException] {
      new PausingProvider().inferSchema(new CaseInsensitiveStringMap(opts))
    }
  }
}
