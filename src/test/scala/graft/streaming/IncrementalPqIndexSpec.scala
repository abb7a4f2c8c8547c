package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ann.Ann

/** The incremental IVF+PQ index: serve equals the batch
  * ivfPqSearchIndexed + exact-re-rank closed form over every ingested
  * prefix, N standing probes equal N independent single-probe serves
  * (the multi-probe contract), replays are no-ops, and a fresh open
  * serves the same rows — the store protocol itself is
  * EpochPartitionedStore's, pinned by StoreFuzzSpec. */
class IncrementalPqIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private def cents: DataFrame = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cent_id"), Ann.toDouble(col("embedding")).as("ce"))

  private def cb: DataFrame = Ann.pqCodebook(Ann.pqSubvectors(emb, 8), 16)

  private def probes: DataFrame = emb.filter(col("vec_id") < 4)

  private def served(ipx: IncrementalPqIndex,
      p: DataFrame = probes): Seq[(Long, Long, Long, Double)] =
    ipx.serve(p, k = 3, nprobe = 2, rerank = 6)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long, Double)].collect().toSeq

  /** The batch spelling of the two-pass serve: ADC top-6 via
    * ivfPqSearchIndexed over the prefix, exact cosine re-rank to
    * top-3 — identical literal shapes to IncrementalPqIndex.serve. */
  private def batchForm(prefix: DataFrame): Seq[(Long, Long, Long, Double)] = {
    val candCells = Ann.cellAssign(cents.withColumn("cnr", Ann.norm(col("ce"))),
        prefix, 1)
      .select(col("vec_id").as("cand_id"), col("cent_id"))
    val codes = Ann.pqEncode(Ann.pqSubvectors(prefix, 8), cb)
      .withColumnRenamed("vec_id", "cand_id")
    val adcTop = Ann.ivfPqSearchIndexed(cents, cb, candCells, codes,
      probes, m = 8, k = 6, nprobe = 2)
    val qv = probes.select(col("vec_id").as("query_id"),
        Ann.toDouble(col("embedding")).as("qv"))
      .withColumn("qn", Ann.norm(col("qv")))
    val cv = prefix.select(col("vec_id").as("cand_id"),
        Ann.toDouble(col("embedding")).as("cv"))
      .withColumn("cn", Ann.norm(col("cv")))
    val exact = cv
      .join(adcTop.select(col("query_id"), col("cand_id")), Seq("cand_id"))
      .join(qv, Seq("query_id"))
      .withColumn("cos",
        round(Ann.cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    exact.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select(col("query_id"), col("cand_id"), col("rank"), col("cos"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long, Double)].collect().toSeq
  }

  test("serve matches the batch ADC+re-rank closed form on every prefix") {
    val dir = Files.createTempDirectory("ipx-").toString
    val ipx = new IncrementalPqIndex(spark, dir, cents, cb, m = 8,
      name = "t", compactEvery = 2)
    val fileCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until 4).foreach { e =>
      ipx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(4L)) === e), e)
      fileCounts += ipx.cellFileCount()
      assert(served(ipx) ==
        batchForm(emb.filter(pmod(col("vec_id"), lit(4L)) <= e)),
        s"epoch $e serve diverged from the batch ADC+re-rank form")
    }
    // tiered floor: one file per occupied cell (8) per live run
    for ((e, liveRuns) <- Seq(1 -> 1, 3 -> 2))
      assert(fileCounts(e) <= 8 * liveRuns,
        s"cell store not at its compacted floor after epoch $e: $fileCounts")
  }

  test("N standing probes equal N independent single-probe serves") {
    val dir = Files.createTempDirectory("ipx-mp-").toString
    val ipx = new IncrementalPqIndex(spark, dir, cents, cb, m = 8, name = "t")
    ipx.appendEpoch(emb.limit(300), 0L)
    val multi = served(ipx)
    val singles = (0L until 4L).flatMap { q =>
      served(ipx, emb.filter(col("vec_id") === q))
    }.sortBy(r => (r._1, r._3))
    assert(multi.sortBy(r => (r._1, r._3)) == singles,
      "multi-probe serve must be row-identical to independent serves")
  }

  test("a replayed epoch is a no-op; a fresh open serves the same rows") {
    val dir = Files.createTempDirectory("ipx-rp-").toString
    val ipx = new IncrementalPqIndex(spark, dir, cents, cb, m = 8,
      name = "t", compactEvery = 2)
    ipx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(3L)) === 0), 0L)
    ipx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(3L)) === 1), 1L)
    val want = served(ipx)
    ipx.appendEpoch(emb.limit(5).withColumn("vec_id", col("vec_id") + 9000L), 1L)
    assert(served(ipx) == want, "replayed epoch changed the index")
    val reopened = new IncrementalPqIndex(spark, dir, cents, cb, m = 8,
      name = "t")
    assert(served(reopened) == want)
    assert(want == batchForm(emb.filter(pmod(col("vec_id"), lit(3L)) <= 1)))
  }
}
