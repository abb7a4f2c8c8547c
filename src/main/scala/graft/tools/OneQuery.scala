package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Run a single gated query + dump its oracle, for fast iteration with
  * tools/local_check.py on one query instead of the full Verify pass. */
object OneQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outDir) = args
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    SparkEntry.queries(name)(spark, sfDir).coalesce(1)
      .write.mode("overwrite").parquet(s"$outDir/$name")
    // Full JSON string escaping: oracle SQL is single-line by
    // construction today, but don't depend on it.
    val sql = SparkEntry.oracleSql(name).flatMap {
      case '\\' => "\\\\"
      case '"'  => "\\\""
      case c if c < 0x20 => String.format("\\u%04x", Int.box(c.toInt))
      case c => c.toString
    }
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"),
      s"""{"$name": "$sql"}""")
    spark.stop()
  }
}
