package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.model.PipelineSpec
import graft.streaming.PipelineManager

/**
 * Runnable usage sample of the pipeline control plane: create →
 * start → pause → append → resume (checkpoint recovery, no replay)
 * → status → delete. The lifecycle mirrors SURVEY.md §3.1.
 */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._

    val root = Files.createTempDirectory("pm-demo-").toString
    val src = Files.createTempDirectory("pm-src-").toString
    Seq((1L, "a"), (2L, "b")).toDF("k", "v").write.mode("append").parquet(src)

    val pm = new PipelineManager(spark, root)
    val spec = pm.create(PipelineSpec("demo", "parquet", "parquet", src))
    println(s"DEMO created dest=${spec.destinationConnection}")

    pm.start("demo", df => df.withColumn("stamp", lit("x"))).awaitTermination()
    println(s"DEMO delivered=${spark.read.parquet(spec.destinationConnection).count()}")

    pm.pause("demo")
    Seq((3L, "c")).toDF("k", "v").write.mode("append").parquet(src)
    pm.resume("demo", df => df.withColumn("stamp", lit("x"))).awaitTermination()
    val rows = spark.read.parquet(spec.destinationConnection)
      .orderBy("k").as[(Long, String, String)].collect().mkString(";")
    println(s"DEMO afterResume=$rows")
    println(s"DEMO status=${pm.status()}")

    try pm.create(PipelineSpec("demo", "parquet", "parquet", src))
    catch { case e: IllegalArgumentException => println(s"DEMO dupRejected=${e.getMessage}") }

    pm.delete("demo")
    spark.stop()
  }
}
