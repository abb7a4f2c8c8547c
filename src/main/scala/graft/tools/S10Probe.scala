package graft.tools

import java.nio.file.Files

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/**
 * Diagnostic for the s10 sf0.1 divergence (2 missing outer-null rows):
 * replays the exact s10 harness at a given sf and prints, per epoch,
 * the emitted row/null counts and max evicted click_ts, plus each
 * run's final watermark from query progress — enough to see which
 * trailing sweep ran with which watermark.
 */
object S10Probe {
  def main(args: Array[String]): Unit = {
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val base = graft.queries.Tables.t(spark, d, "events")
      .select(col("event_id"), col("event_type"), col("user_id"), col("ts"))
      .filter(col("event_type").isin("click", "purchase"))
    val srcDir = Files.createTempDirectory("s10p-src-").toString
    val ckpt = Files.createTempDirectory("s10p-ckpt-").toString
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
          val rows = batch.persist()
          val n = rows.count()
          val nulls = rows.filter(col("purchase_id").isNull)
          val nn = nulls.count()
          val maxNullTs = nulls.agg(max(col("click_ts"))).head().get(0)
          val interesting = rows
            .filter(col("click_id").isin(99792L, 99795L)).count()
          println(s"S10P run=$b epoch=$epoch rows=$n nulls=$nn " +
            s"maxNullClickTs=$maxNullTs probeClicks=$interesting")
          rows.unpersist()
          ()
        }
        .start()
      q.awaitTermination()
      q.recentProgress.foreach { p =>
        println(s"S10P run=$b PROGRESS batch=${p.batchId} " +
          s"inputRows=${p.numInputRows} wm=${p.eventTime.get("watermark")} " +
          s"maxEvt=${p.eventTime.get("max")}")
      }
    }
    spark.stop()
  }
}
