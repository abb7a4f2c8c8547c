package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.dedup.Dedup
object ProfD18 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"
    val docs = graft.queries.Tables.t(spark, d, "documents")
    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prof] $label: ${(System.nanoTime()-t0)/1e9}%.2f s"); r
    }
    val sg = time("signatures materialize") {
      val x = Dedup.signatures(docs, col("doc_id"), col("text"), 16, 3, 4)
      x.bands.count(); x.shingles.count(); x.simhash.count(); x
    }
    val lsh = time("lsh pairs")(
      { val f = Dedup.lshCandidatesFromBands(sg.bands)
        .select(col("doc_a"), col("doc_b")).withColumn("mh", lit(1L)); f.count(); f })
    val sim = time("simhash pairs")(
      { val f = Dedup.simHashPairs(sg.simhash, 10)
        .select(col("doc_a"), col("doc_b")).withColumn("sh", lit(1L)); f.count(); f })
    val pairs = time("full outer")(
      { val f = lsh.join(sim, Seq("doc_a","doc_b"), "full_outer")
        .select(col("doc_a"), col("doc_b"),
          coalesce(col("mh"), lit(0L)).as("minhash_hit"),
          coalesce(col("sh"), lit(0L)).as("simhash_hit")); f.count(); f })
    time("jaccard verify")(
      pairs.join(Dedup.jaccardForShingles(sg.shingles, pairs), Seq("doc_a","doc_b")).count())
    spark.stop()
  }
}
