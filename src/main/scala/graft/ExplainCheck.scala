package graft
import org.apache.spark.sql.SparkSession
object ExplainCheck {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions","8").config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.01"
    for (q <- Seq("q03_hash_shard", "q17_ttl_filter", "q21_revenue_by_nation", "e01_cosine_pairs", "d03_lsh_candidates")) {
      println(s"===== $q")
      println(SparkEntry.queries(q)(spark, d).queryExecution.explainString(org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
