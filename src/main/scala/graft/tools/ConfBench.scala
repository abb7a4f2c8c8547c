package graft.tools

import org.apache.spark.sql.SparkSession

/** A/B harness for SESSION-CONF experiments: same methodology as
  * BenchRepeat (one warmed JVM, n timed runs per gate, median), but the
  * session is built with extra confs from SPARK_GRAFT_CONF
  * ("k=v;k=v"). Dev harness only — the shipping defaults live in
  * Bench.scala; this exists to measure a candidate before it ships.
  *
  * Usage: ConfBench [n] [queryName...]   (env SPARK_GRAFT_CONF)
  */
object ConfBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val n = args.headOption.map(_.toInt).getOrElse(3)
    val names = args.drop(1).toSeq
    val extra = sys.env.getOrElse("SPARK_GRAFT_CONF", "")
      .split(';').toSeq.map(_.trim).filter(_.nonEmpty)
      .map { kv =>
        kv.split("=", 2) match {
          case Array(k, v) => (k, v)
          case _ => sys.error(
            s"SPARK_GRAFT_CONF token '$kv' is not k=v (tokens are ';'-separated)")
        }
      }
    var b = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
    extra.foreach { case (k, v) => b = b.config(k, v) }
    val spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    extra.foreach { case (k, v) => System.err.println(s"[conf] $k=$v") }

    val results = names.map { name =>
      val fn = SparkEntryAccess(name)
      fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      if (name.startsWith("s")) org.apache.spark.sql.GraftBridge.unloadStateStores()
      val times = (1 to n).map { _ =>
        val t0 = System.nanoTime()
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        val dt = (System.nanoTime() - t0) / 1e9
        if (name.startsWith("s")) org.apache.spark.sql.GraftBridge.unloadStateStores()
        dt
      }.sorted
      name -> times
    }
    results.foreach { case (name, ts) =>
      val fmt = ts.map(t => f"$t%.3f").mkString("[", ",", "]")
      // true median: middle sample for odd n, mean of the two middle
      // samples for even n (ts is sorted)
      val med =
        if (ts.size % 2 == 1) ts(ts.size / 2)
        else (ts(ts.size / 2 - 1) + ts(ts.size / 2)) / 2.0
      println(f"""{"query":"$name","n":$n,"min":${ts.head}%.3f,""" +
        f""""median":$med%.3f,"max":${ts.last}%.3f,"times":$fmt}""")
    }
    graft.queries.DataOpsQueries.release(sfDir)
    spark.stop()
  }

  private def SparkEntryAccess(name: String) = graft.SparkEntry.queries(name)
}
