package graft

import org.apache.spark.sql.SparkSession

/** Local smoke of the driver contract: entry() must return rows > 0
  * on sf0.001. Mirrors the per-round driver check. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"SMOKE entry rows=$n schema=${df.schema.fieldNames.mkString(",")}")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
