package graft.sources

import java.nio.file.{Files, Paths, StandardOpenOption}

import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase

/** Listing-diff directory watch source: snapshots as offsets, diffs as
  * micro-batches, checkpoint-resumable. */
class DirWatchSpec extends SparkTestBase {
  import spark.implicits._

  private def write(dir: String, name: String, content: String): Unit =
    Files.write(Paths.get(dir, name), content.getBytes("UTF-8"),
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)

  test("diff computes created/modified/deleted deterministically") {
    val from = Map("a" -> (1L, 10L), "b" -> (1L, 20L), "c" -> (1L, 30L))
    val to = Map("a" -> (1L, 10L), "b" -> (2L, 25L), "d" -> (9L, 5L))
    val events = DirWatch.diff(from, to)
    assert(events == Seq(
      DirWatchEvent("d", "CREATED", 9L, 5L),
      DirWatchEvent("b", "MODIFIED", 2L, 25L),
      DirWatchEvent("c", "DELETED", 1L, 30L)))
  }

  test("offset snapshot round-trips through json") {
    val off = DirWatchOffset(Map("x.txt" -> (123L, 456L), "y" -> (1L, 2L)))
    assert(DirWatchOffset.fromJson(off.json()) == off)
  }

  test("streams listing diffs across runs from the checkpoint") {
    val watched = Files.createTempDirectory("graft-watch-").toString
    val dest = Files.createTempDirectory("graft-watch-out-").toString + "/out"
    val ckpt = Files.createTempDirectory("graft-watch-ckpt-").toString
    write(watched, "one.txt", "1")
    write(watched, "two.txt", "22")

    def run(): Unit = {
      val q = spark.readStream
        .format(classOf[DirWatchProvider].getName)
        .option("path", watched).load()
        .writeStream.format("parquet")
        .option("path", dest).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination()
    }

    // run 1: pre-existing files surface as CREATED (initial snapshot)
    run()
    val got1 = spark.read.parquet(dest)
      .select($"path", $"kind").as[(String, String)].collect().toSet
    assert(got1 == Set(("one.txt", "CREATED"), ("two.txt", "CREATED")))

    // change the world: grow one file, add one, delete one
    write(watched, "one.txt", "1-changed")
    write(watched, "three.txt", "333")
    Files.delete(Paths.get(watched, "two.txt"))

    // run 2 (same checkpoint): ONLY the diffs arrive
    run()
    val got2 = spark.read.parquet(dest)
      .select($"path", $"kind").as[(String, String)].collect().toSet
    assert(got2 == got1 ++ Set(
      ("one.txt", "MODIFIED"), ("three.txt", "CREATED"), ("two.txt", "DELETED")))

    // run 3: nothing changed → nothing new
    run()
    assert(spark.read.parquet(dest).count() == 5)
  }

  test("dirwatch connector works through the pipeline manager") {
    val watched = Files.createTempDirectory("graft-watch-pm-").toString
    write(watched, "f.txt", "hello")
    val pm = new graft.streaming.PipelineManager(spark,
      Files.createTempDirectory("graft-watch-pm-ckpt-").toString)
    val spec = pm.create(graft.model.PipelineSpec(
      "dw", "dirwatch", "parquet", watched))
    pm.start("dw", identity).awaitTermination()
    val got = spark.read.parquet(spec.destinationConnection)
      .select($"path", $"kind").as[(String, String)].collect().toSet
    assert(got == Set(("f.txt", "CREATED")))
    pm.delete("dw")
  }
}
