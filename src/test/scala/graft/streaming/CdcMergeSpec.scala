package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

case class Change(key: Long, scn: Long, opcode: String, value: String)

/** CDC change-stream → materialized keyed state via foreachBatch
  * upsert (the engine's MERGE INTO analog over parquet state). */
class CdcMergeSpec extends SparkTestBase {
  import spark.implicits._

  test("latestState collapses a CDC log last-writer-wins with deletes") {
    val log = Seq(
      Change(1L, 1L, "INSERT", "a1"),
      Change(1L, 3L, "UPDATE", "a3"),
      Change(2L, 2L, "INSERT", "b2"),
      Change(2L, 4L, "DELETE", ""),
      Change(3L, 5L, "INSERT", "c5")).toDF()
    val got = CdcMerge.latestState(log, Seq("key"), "scn", "opcode")
      .select($"key", $"value").as[(Long, String)].collect().toMap
    assert(got == Map(1L -> "a3", 3L -> "c5"))
  }

  test("streaming foreachBatch upsert materializes state across epochs") {
    implicit val sqlCtx = spark.sqlContext
    val statePath = Files.createTempDirectory("graft-cdc-").toString + "/state"
    val ckpt = Files.createTempDirectory("graft-cdc-ckpt-").toString
    val in = MemoryStream[Change]

    val q = in.toDF().writeStream
      .option("checkpointLocation", ckpt)
      .outputMode("append")
      .trigger(Trigger.ProcessingTime(0))
      .foreachBatch { (batch: DataFrame, _: Long) =>
        CdcMerge.applyBatch(spark, batch, statePath,
          Seq("key"), "scn", "opcode")
      }
      .start()

    def state(): Map[Long, String] =
      spark.read.parquet(statePath)
        .select($"key", $"value").as[(Long, String)].collect().toMap

    // epoch 1: two inserts
    in.addData(Change(1L, 1L, "INSERT", "a1"), Change(2L, 2L, "INSERT", "b2"))
    q.processAllAvailable()
    assert(state() == Map(1L -> "a1", 2L -> "b2"))

    // epoch 2: update key 1, delete key 2, insert key 3
    in.addData(Change(1L, 3L, "UPDATE", "a3"), Change(2L, 4L, "DELETE", ""),
      Change(3L, 5L, "INSERT", "c5"))
    q.processAllAvailable()
    assert(state() == Map(1L -> "a3", 3L -> "c5"))

    // epoch 3: out-of-order within batch — highest scn wins
    in.addData(Change(3L, 7L, "UPDATE", "c7"), Change(3L, 6L, "UPDATE", "c6"))
    q.processAllAvailable()
    assert(state() == Map(1L -> "a3", 3L -> "c7"))

    q.stop()
  }
}
