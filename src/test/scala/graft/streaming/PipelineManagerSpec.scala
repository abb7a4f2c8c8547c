package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.SaveMode

import graft.SparkTestBase
import graft.model.{PipelineSpec, PipelineStatus}

/**
 * End-to-end pipeline lifecycle — the Spark analog of the reference's
 * TestDatastreamServer file-connector e2e (create → produce → consume
 * → assert payloads; delete/recreate; resume).
 */
class PipelineManagerSpec extends SparkTestBase {
  import spark.implicits._

  private def newManager() =
    new PipelineManager(spark, Files.createTempDirectory("graft-pm-").toString)

  test("create validates, dedups destination by source, rejects BYOT conflicts") {
    val pm = newManager()
    val a = pm.create(PipelineSpec("a", "parquet", "memory", "/src/one"))
    assert(a.status == PipelineStatus.Ready)
    assert(a.destinationConnection == "dest-a")

    // D1: same source reuses the destination.
    val b = pm.create(PipelineSpec("b", "parquet", "memory", "/src/one"))
    assert(b.destinationConnection == "dest-a")

    // duplicate name rejected
    intercept[IllegalArgumentException] {
      pm.create(PipelineSpec("a", "parquet", "memory", "/src/two"))
    }
    // D2: explicit destination conflict rejected
    pm.create(PipelineSpec("c", "parquet", "memory", "/src/three",
      destinationConnection = "byot-dest"))
    intercept[IllegalArgumentException] {
      pm.create(PipelineSpec("d", "parquet", "memory", "/src/four",
        destinationConnection = "byot-dest"))
    }
    // paging over specs
    assert(pm.list(0, 2).map(_.name) == Seq("a", "b"))
  }

  test("pipeline delivers records, then resumes from checkpoint without replay") {
    val pm = newManager()
    val srcDir = Files.createTempDirectory("graft-src-").toString
    Seq((1L, "v1"), (2L, "v2")).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(srcDir)

    // Durable transport (parquet) so the checkpoint is recoverable.
    val spec = pm.create(PipelineSpec("p1", "parquet", "parquet", srcDir))
    val q = pm.start("p1", df => df.withColumn("tag", lit("t")))
    q.awaitTermination()
    assert(spark.read.parquet(spec.destinationConnection).count() == 2)
    assert(pm.status().exists(s => s._1 == "p1"))

    // pause (stop, checkpoints retained), append new data, resume:
    // only the NEW file is processed — offsets came from the log, no
    // replay of already-delivered records into the destination.
    pm.pause("p1")
    assert(pm.get("p1").get.status == PipelineStatus.Paused)
    Seq((3L, "v3")).toDF("k", "v")
      .write.mode(SaveMode.Append).parquet(srcDir)
    val q2 = pm.resume("p1", df => df.withColumn("tag", lit("t")))
    q2.awaitTermination()
    assert(spark.read.parquet(spec.destinationConnection)
      .as[(Long, String, String)].collect().toSet ==
      Set((1L, "v1", "t"), (2L, "v2", "t"), (3L, "v3", "t")))

    pm.delete("p1")
    assert(pm.get("p1").isEmpty)
  }
}
