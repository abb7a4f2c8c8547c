package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Exploratory probe: does a watermarked stream-stream LEFT OUTER join
 * under Trigger.AvailableNow emit its outer-null rows deterministically
 * across checkpointed multi-batch runs? Determines whether an s10 gate
 * (outer-join finalization) can be oracled exactly.
 */
object OuterJoinProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = "/root/testdata/sf0.001"
    val base = graft.queries.Tables.t(spark, d, "events")
      .select(col("event_id"), col("event_type"), col("user_id"), col("ts"))
    val srcDir = Files.createTempDirectory("probe-src-").toString
    val outDir = Files.createTempDirectory("probe-out-").toString
    val ckpt = Files.createTempDirectory("probe-ckpt-").toString
    val schema = base.schema

    (0 until 3).foreach { b =>
      base.filter(pmod(col("event_id"), lit(3L)) === b)
        .coalesce(1).write.mode("append").parquet(srcDir)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir)
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "30 minutes")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "30 minutes")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"))
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          graft.streaming.PipelineManager.epochAppend(
            batch, outDir, epoch, "probe"): Unit
        }
        .start()
      q.awaitTermination()
    }

    val out = spark.read.parquet(outDir)
    val total = out.count()
    val nulls = out.filter(col("purchase_id").isNull).count()
    val maxTs = base.agg(max(col("ts"))).as[java.sql.Timestamp].head()
    val nullsBelowFinalWm = out.filter(col("purchase_id").isNull)
      .filter(col("click_ts") + expr("INTERVAL 90 MINUTE") <= lit(maxTs))
      .count()
    println(s"PROBE total=$total nulls=$nulls maxTs=$maxTs " +
      s"nullsWithEvictableState=$nullsBelowFinalWm")
    println(s"PROBE outDir=$outDir")
    // second identical full rerun from scratch to test determinism
    val srcDir2 = Files.createTempDirectory("probe-src2-").toString
    val outDir2 = Files.createTempDirectory("probe-out2-").toString
    val ckpt2 = Files.createTempDirectory("probe-ckpt2-").toString
    (0 until 3).foreach { b =>
      base.filter(pmod(col("event_id"), lit(3L)) === b)
        .coalesce(1).write.mode("append").parquet(srcDir2)
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1").parquet(srcDir2)
      val clicks = stream.filter(col("event_type") === "click")
        .select(col("user_id"), col("event_id").as("click_id"),
          col("ts").as("click_ts"))
        .withWatermark("click_ts", "30 minutes")
      val purchases = stream.filter(col("event_type") === "purchase")
        .select(col("user_id").as("p_user_id"),
          col("event_id").as("purchase_id"), col("ts").as("purchase_ts"))
        .withWatermark("purchase_ts", "30 minutes")
      val joined = clicks.join(purchases,
        col("user_id") === col("p_user_id") &&
          col("purchase_ts") >= col("click_ts") &&
          col("purchase_ts") <= col("click_ts") + expr("INTERVAL 1 HOUR"),
        "leftOuter")
        .select(col("user_id"), col("click_id"), col("purchase_id"),
          col("click_ts"))
      val q = joined.writeStream
        .outputMode("append")
        .option("checkpointLocation", ckpt2)
        .trigger(Trigger.AvailableNow())
        .foreachBatch { (batch: DataFrame, epoch: Long) =>
          graft.streaming.PipelineManager.epochAppend(
            batch, outDir2, epoch, "probe"): Unit
        }
        .start()
      q.awaitTermination()
    }
    val out2 = spark.read.parquet(outDir2)
    val a = out.select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Option[Long])].collect().toSeq.sorted(
        Ordering.by((t: (Long, Long, Option[Long])) =>
          (t._1, t._2, t._3.getOrElse(-1L))))
    val bb = out2.select("user_id", "click_id", "purchase_id")
      .as[(Long, Long, Option[Long])].collect().toSeq.sorted(
        Ordering.by((t: (Long, Long, Option[Long])) =>
          (t._1, t._2, t._3.getOrElse(-1L))))
    println(s"PROBE deterministic=${a == bb} run1=${a.size} run2=${bb.size}")
    spark.stop()
  }
}
