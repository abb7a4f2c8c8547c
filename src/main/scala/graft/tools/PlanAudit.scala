package graft.tools

import org.apache.spark.sql.SparkSession

/** Ad-hoc plan inspector: `runMain graft.tools.PlanAudit q36 q37` —
  * prints the executed plan of each gated query whose name starts
  * with a given prefix, at SPARK_GRAFT_SF_DIR (default sf0.01). */
object PlanAudit {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else graft.SparkEntry.queries.keys.toSeq.sorted
    names.foreach { prefix =>
      graft.SparkEntry.queries.keys.filter(_.startsWith(prefix)).toSeq.sorted
        .foreach { name =>
          println(s"===== $name =====")
          println(graft.SparkEntry.queries(name)(spark, d)
            .queryExecution.executedPlan.toString)
        }
    }
    spark.stop()
  }
}
