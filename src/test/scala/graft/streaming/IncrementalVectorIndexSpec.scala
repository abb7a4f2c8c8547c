package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.ann.Ann

/** The incremental IVF vector index: serve equals the batch
  * ivfTopKWith closed form over every ingested prefix, compaction
  * keeps the cell store at its floor, and replays are no-ops — the
  * crash protocol itself is EpochPartitionedStore's, already pinned
  * by IncrementalLexIndexSpec. */
class IncrementalVectorIndexSpec extends SparkTestBase {
  import spark.implicits._

  private def emb: DataFrame =
    spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private def cents: DataFrame = emb.filter(col("vec_id") < 8)
    .select(col("vec_id").as("cent_id"), Ann.toDouble(col("embedding")).as("ce"))

  private def probes: DataFrame = emb.filter(col("vec_id") < 4)

  private def served(ivx: IncrementalVectorIndex): Seq[(Long, Long, Long, Long, Double)] =
    ivx.serve(probes, k = 3, nprobe = 2)
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

  private def batchForm(prefix: DataFrame): Seq[(Long, Long, Long, Long, Double)] =
    Ann.ivfTopKWith(cents, probes, prefix, k = 3, nprobe = 2)
      .withColumn("rank", col("rank").cast("long"))
      .orderBy(col("query_id"), col("rank"))
      .as[(Long, Long, Long, Long, Double)].collect().toSeq

  test("serve matches the batch IVF closed form on every prefix; cells stay compacted") {
    val dir = Files.createTempDirectory("ivx-").toString
    val ivx = new IncrementalVectorIndex(spark, dir, cents, name = "t",
      compactEvery = 2)
    val fileCounts = scala.collection.mutable.ArrayBuffer.empty[Int]
    (0 until 4).foreach { e =>
      ivx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(4L)) === e), e)
      fileCounts += ivx.cellFileCount()
      assert(served(ivx) ==
        batchForm(emb.filter(pmod(col("vec_id"), lit(4L)) <= e)),
        s"epoch $e serve diverged from the batch IVF form")
    }
    // compaction ran after epochs 1 and 3: the store sits at its
    // TIERED floor — one file per occupied cell (8 cells) PER LIVE
    // RUN (one level-1 run per tick until tierFanIn fills), never
    // the accumulated raw epochs' worth
    for ((e, liveRuns) <- Seq(1 -> 1, 3 -> 2))
      assert(fileCounts(e) <= 8 * liveRuns,
        s"cell store not at its compacted floor after epoch $e: $fileCounts")
  }

  test("N standing probes equal N independent single-probe serves") {
    // the s28 serveMulti contract on the vector side: serve() is
    // multi-probe by construction — one store pass pruned to the
    // union of probed cells (PlanSpec pins the single scan), rows
    // identical to running each probe alone
    val dir = Files.createTempDirectory("ivx-mp-").toString
    val ivx = new IncrementalVectorIndex(spark, dir, cents, name = "t")
    ivx.appendEpoch(emb.limit(300), 0L)
    def rows(p: DataFrame) = ivx.serve(p, k = 3, nprobe = 2)
      .as[(Long, Long, Long, Long, Double)].collect().toSeq
      .sortBy(r => (r._1, r._4))
    val multi = rows(probes)
    val singles = (0L until 4L).flatMap { q =>
      rows(emb.filter(col("vec_id") === q))
    }.sortBy(r => (r._1, r._4))
    assert(multi == singles,
      "multi-probe serve must be row-identical to independent serves")
  }

  test("a replayed epoch is a no-op; a fresh open serves the same rows") {
    val dir = Files.createTempDirectory("ivx-rp-").toString
    val ivx = new IncrementalVectorIndex(spark, dir, cents, name = "t",
      compactEvery = 2)
    ivx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(3L)) === 0), 0L)
    ivx.appendEpoch(emb.filter(pmod(col("vec_id"), lit(3L)) === 1), 1L)
    val want = served(ivx)
    // replay epoch 1 with poisoned data: the committed epoch wins
    ivx.appendEpoch(emb.limit(5).withColumn("vec_id", col("vec_id") + 9000L), 1L)
    assert(served(ivx) == want, "replayed epoch changed the index")
    val reopened = new IncrementalVectorIndex(spark, dir, cents, name = "t")
    assert(served(reopened) == want)
    assert(want == batchForm(emb.filter(pmod(col("vec_id"), lit(3L)) <= 1)))
  }
}
