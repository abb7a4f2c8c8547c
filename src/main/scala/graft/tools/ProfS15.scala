package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing probe for the s15 durable-index dedup gate:
  * attributes its wall time to (a) corpus band computation, (b) the
  * bootstrap index write, (c) the three streaming-query startups, and
  * (d) per-epoch batch work — so the shave target is measured, not
  * guessed. Dev harness only; not part of the gated surface. */
object ProfS15 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[prof] $label ${(System.nanoTime() - t0) / 1e9}%.3fs")
      r
    }
    // warm
    spark.read.parquet(s"$sfDir/documents.parquet").count()

    (1 to 2).foreach { round =>
      println(s"--- round $round ---")
      val docs = graft.queries.Tables.t(spark, sfDir, "documents")
      val bands = timed("sharedBands")(
        graft.queries.DataOpsQueries.sharedBands(spark, sfDir))
      val rows = docs.select(col("doc_id").as("doc"))
        .join(bands, Seq("doc"), "left")
        .select(col("doc"), col("band").cast("long").as("band"), col("bh"))
        .persist()
      val idxDir = java.nio.file.Files.createTempDirectory("prof-idx-").toString
      timed("bands+bootstrap-write") {
        rows.filter(pmod(col("doc"), lit(5L)) < 2 && col("band").isNotNull)
          .coalesce(1).write.mode("overwrite").parquet(idxDir)
      }
      timed("batch-write x3") {
        val srcDir = java.nio.file.Files.createTempDirectory("prof-src-").toString
        (2 until 5).foreach { b =>
          rows.filter(pmod(col("doc"), lit(5L)) === b)
            .coalesce(1).write.mode("append").parquet(srcDir)
        }
      }
      val idxView = timed("recovery-read")(
        spark.read.parquet(idxDir).localCheckpoint())
      timed("epoch-work x3 (no streaming engine)") {
        var view = idxView
        (2 until 5).foreach { b =>
          val bt = rows.filter(pmod(col("doc"), lit(5L)) === b).localCheckpoint()
          val bb = bt.filter(col("band").isNotNull)
          val v = graft.dedup.Dedup.indexDedupBatch(
            view, bb, bt.select(col("doc")).distinct()).localCheckpoint()
          val admitted = graft.dedup.Dedup.admitBands(bb, v).localCheckpoint()
          view = view.union(admitted)
        }
      }
      timed("full gate") {
        graft.SparkEntry.queries("s15_stream_index_dedup")(spark, sfDir)
          .write.format("noop").mode("overwrite").save()
      }
      org.apache.spark.sql.GraftBridge.unloadStateStores()
      rows.unpersist(true)
    }
    spark.stop()
  }
}
