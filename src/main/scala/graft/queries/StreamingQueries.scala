package graft.queries

import java.nio.file.Files
import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.operators.Translate

/**
 * Structured-Streaming forms of the data-plane operators, run
 * synchronously (Trigger.AvailableNow over the parquet corpus treated
 * as a file stream) so the correctness gate checks the streaming
 * execution path against the same batch SQL oracle — stateless
 * transforms and complete-mode aggregations produce identical results
 * by construction.
 */
object StreamingQueries {

  private val runId = new AtomicInteger(0)

  private def runToTable(df: DataFrame, mode: String): DataFrame = {
    val spark = df.sparkSession
    val name = s"stream_out_${runId.incrementAndGet()}"
    val ckpt = Files.createTempDirectory("graft-ckpt-").toString
    val q = df.writeStream
      .queryName(name)
      .outputMode(mode)
      .format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.table(name)
  }

  private def eventsStream(s: SparkSession, dir: String): DataFrame = {
    // The file-stream source requires a directory; glob-filter the one
    // table out of the shared corpus dir. ts arrives as int64-nanos
    // (see Tables) and is truncated to micros here.
    val schema = Tables.rawSchema(s, dir, "events")
    s.readStream.schema(schema)
      .option("pathGlobFilter", "events.parquet")
      .parquet(dir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
  }

  private def kafkaShaped(events: DataFrame): DataFrame =
    events.select(
      col("event_type").as("topic"),
      pmod(col("user_id"), lit(8L)).as("partition"),
      col("event_id").as("offset"),
      col("user_id").cast("string").as("key"),
      col("props").as("value"),
      col("ts"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // The mirror pipeline (poll → translate → sink) under streaming
    // execution; per-record transform chain identical to q02.
    "s01_stream_mirror" -> ((s, d) =>
      runToTable(
        Translate.mirror(kafkaShaped(eventsStream(s, d)), "mirror.%s", "p-"),
        mode = "append")),

    // Streaming stateful aggregation (complete mode = full rollup).
    "s02_stream_agg" -> ((s, d) =>
      runToTable(
        eventsStream(s, d)
          .groupBy(col("event_type"))
          .agg(
            count(lit(1)).as("n"),
            sum(col("value").cast("decimal(18,2)")).cast("double").as("value_total")),
        mode = "complete")))

  val oracles: Map[String, String] = Map(
    "s01_stream_mirror" -> BrooklinQueries.oracles("q02_mirror_translate"),
    "s02_stream_agg" ->
      """SELECT event_type, COUNT(*) AS n,
        |CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS value_total
        |FROM events GROUP BY event_type""".stripMargin.replace("\n", " "))
}
