package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.streaming.IncrementalPqIndex

/**
 * Multi-probe ADC broadcast scaling probe (the r17 verdict's watch
 * item): IncrementalPqIndex.serve builds its per-query ADC table as
 * `pqSubvectors(probes, m) × codebook` and BROADCASTS it into the
 * code-join — (Q probes) × (m subs) × (|codes|) rows, linear in the
 * number of standing queries. This probe measures serve wall time at
 * Q = 4 → 1024 standing probes against a production-shaped 256-code
 * codebook over an 8×-unioned corpus, so the broadcast reaches the
 * Q·m·256 ≈ 2M-row scale the shape question is about. The question:
 * does per-probe serve cost stay ~flat (the broadcast join is the
 * right shape) or bend superlinearly (wants a bloom/range partition
 * around Q ≈ 10³)? Numbers land in PERF_NOTES.md.
 */
object PqMultiProbe {
  def main(args: Array[String]): Unit = {
    val base = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val factor = sys.env.getOrElse("SPARK_GRAFT_SCALE_FACTOR", "8").toInt
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val emb = spark.read.parquet(s"$base/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val baseN = emb.count()
    // 8× corpus: ids remapped; embeddings kept (timing probe — the
    // serve plan is value-independent)
    val corpus = (0 until factor).map { i =>
      emb.select((col("vec_id") * factor + i).as("vec_id"),
        col("embedding"))
    }.reduce(_ unionByName _).localCheckpoint()
    val m = 8
    val cents = emb.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cent_id"),
        Ann.toDouble(col("embedding")).as("ce"))
    // production-shaped codebook: 256 codes per subspace
    val cb = Ann.pqCodebook(Ann.pqSubvectors(emb, m), 256).localCheckpoint()

    val dir = java.nio.file.Files.createTempDirectory("graft-pqq-").toString
    val ipx = new IncrementalPqIndex(spark, dir, cents, cb, m = m,
      name = "pqq", compactEvery = 2)
    val epochs = 4
    (0 until epochs).foreach { e =>
      ipx.appendEpoch(
        corpus.filter(pmod(col("vec_id"), lit(epochs.toLong)) === e),
        e.toLong)
    }
    println(s"[pqq] corpus=${baseN * factor} codes=256 m=$m epochs=$epochs")

    Seq(4, 32, 256, 1024).foreach { q =>
      val probes = emb.filter(col("vec_id") < q).localCheckpoint()
      val adcRows = q.toLong * m * 256
      // rep 1 warms codegen/broadcast paths; rep 2 is the measurement
      val times = (1 to 2).map { _ =>
        val t0 = System.nanoTime()
        val n = ipx.serve(probes, k = 10, nprobe = 4, rerank = 30).count()
        ((System.nanoTime() - t0) / 1e9, n)
      }
      val (t2, n2) = times(1)
      println(f"[pqq] Q=$q%4d adcRows=$adcRows%8d rows=$n2%6d " +
        f"t1=${times(0)._1}%6.2fs t2=$t2%6.2fs perProbeMs=${t2 * 1000 / q}%8.2f")
    }
    def del(f: java.io.File): Unit = {
      Option(f.listFiles()).foreach(_.foreach(del)); f.delete(): Unit
    }
    del(new java.io.File(dir))
    spark.stop()
  }
}
