package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.DataOpsQueries

/**
 * 100×-claim stress probe for the widest text/dedup gates: build an
 * 8×-unioned documents corpus (~sf0.8-equivalent, doc ids remapped and
 * a per-copy token prefixed so copies are distinct documents) and time
 * t19/t08/d03 on the base corpus vs the 8× corpus. Near-linear scaling
 * (ratio ≤ 1.5 × the 8× size factor) plus no spill collapse is the
 * pass; numbers land in PERF_NOTES.md.
 *
 * Note the workload is deliberately harsher than a real 8× corpus:
 * the copies' content windows collide across copies, so per-window
 * fan-out in t19's join-back grows 8× while the key count stays
 * roughly flat — the adversarial (duplicate-heavy) end of the dedup
 * workload spectrum.
 */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    val scaled = s"/tmp/graft_scale$factor"
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // default = the widest text/dedup gates; pass gate names as args
    // to probe others. Validate BEFORE the expensive scaled-corpus
    // build so a typo fails in milliseconds, not minutes.
    val gates =
      if (args.nonEmpty) args.toSeq
      else Seq("d03_lsh_candidates", "t08_repetition", "t19_window_novelty")
    val unknown = gates.filterNot(DataOpsQueries.queries.contains)
    require(unknown.isEmpty,
      s"unknown/non-batch gates: ${unknown.mkString(",")} " +
        "(ScaleProbe covers DataOpsQueries gates only)")

    val docs = spark.read.parquet(s"$base/documents.parquet")
    (0 until factor).map { i =>
      docs.select(
        (col("doc_id") * factor + i).as("doc_id"),
        concat(lit(s"copy$i "), col("text")).as("text"),
        col("lang"), col("source"),
        (col("n_chars") + lit(5 + i.toString.length)).as("n_chars"))
    }.reduce(_ unionByName _)
      .write.mode("overwrite").parquet(s"$scaled/documents.parquet")
    // Scaled embeddings whenever a probed gate reads them (the
    // e-family plus t14's doc↔vec integrity joins): ids remapped,
    // each copy's vectors scaled by a distinct factor so copies are
    // distinct vectors and the NORM DISTRIBUTION gains ~8× the
    // distinct values (the adversarial end for e19's
    // counting-selection median).
    if (gates.exists(g => g.startsWith("e") || g == "t14_integrity")) {
      val emb = spark.read.parquet(s"$base/embeddings.parquet")
      (0 until factor).map { i =>
        emb.select(
          (col("vec_id") * factor + i).as("vec_id"),
          transform(col("embedding"),
            x => x * lit(1.0f + i * 0.01f)).as("embedding"),
          col("label"))
      }.reduce(_ unionByName _)
        .write.mode("overwrite").parquet(s"$scaled/embeddings.parquet")
    }
    def time(dir: String, name: String): Double = {
      val t0 = System.nanoTime()
      DataOpsQueries.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    // both runs pay their own one-time spill builds (release first)
    val rows = gates.map { g =>
      DataOpsQueries.release(base); DataOpsQueries.release(scaled)
      val tBase = time(base, g)
      val tBig = time(scaled, g)
      val ratioVsLinear = tBig / (tBase * factor)
      println(f"[scale] $g base=${tBase}%.2fs x$factor=${tBig}%.2fs " +
        f"ratio_vs_linear=${ratioVsLinear}%.2f")
      (g, tBase, tBig, ratioVsLinear)
    }
    DataOpsQueries.release(base); DataOpsQueries.release(scaled)
    val worst = rows.maxBy(_._4)
    println(f"[scale] worst ratio_vs_linear=${worst._4}%.2f (${worst._1}) " +
      s"pass=${worst._4 <= 1.5}")
    spark.stop()
  }
}
