package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann

/**
 * Incremental IVF vector index — the vector-side counterpart of
 * [[IncrementalLexIndex]]: streaming ingest maintains a durable,
 * CELL-PARTITIONED vector store that serves nprobe-gated ANN queries
 * with directory-level pruning, instead of the flat store + brute
 * force the plain ingest path would leave you with.
 *
 * Classic IVF split of work:
 *  - TRAIN ONCE: the centroid codebook (`cent_id`, `ce:
 *    array<double>`) is fixed at index creation (offline k-means or a
 *    sampled slice — [[Ann.kmeansCentroids]] produces one). A fixed
 *    codebook is what makes ingest-time assignment immutable, so a
 *    vector's cell never changes and epoch files never need
 *    reshuffling.
 *  - ASSIGN ON INGEST: each epoch's vectors get their nearest cell
 *    (the [[Ann.ivfTopKWith]] contract: cosine rounded to 6 dp,
 *    ties to the lower cell) and are committed hive-partitioned by
 *    `cell` through an [[EpochPartitionedStore]] — same bounded view,
 *    generation compaction, and crash protocol as the lexical index.
 *  - SERVE: a probe fans out to its `nprobe` nearest cells; the
 *    candidate scan reads ONLY those cells' directories
 *    (PartitionFilters — the IVF pruning surviving to the physical
 *    plan), scores cosine inside them, and takes a per-probe top-k.
 *    Bit-identical to [[Ann.ivfTopKWith]] over the ingested prefix,
 *    because the stored assignment is the same deterministic function
 *    the batch path computes at query time.
 *
 * At 100 TB the store IS the win: the corpus streams in once, each
 * query touches nprobe/nList of it, and compaction keeps the
 * directory fan-out at ~one file per cell no matter how many epochs
 * the ingest has run.
 */
final class IncrementalVectorIndex(spark: SparkSession, dir: String,
    centroids: DataFrame, name: String = "vecidx",
    refreshEvery: Int = DurableIndexView.DefaultRefreshEvery,
    compactEvery: Int = 0) {
  // the tiny fixed codebook, norms precomputed, pinned DRIVER-LOCAL
  // so every epoch's assignment and every serve broadcast it without
  // a per-use collect job (Ann.pinTiny vs the old localCheckpoint)
  private val cents = Ann.pinTiny(centroids.select(col("cent_id"), col("ce"))
    .withColumn("cnr", Ann.norm(col("ce"))))

  private val store = new EpochPartitionedStore(spark, s"$dir/cells",
    "cell", name, refreshEvery, compactEvery)

  /** Fold one ingest batch (`vec_id`, `embedding`) into the index:
    * nearest-cell assignment against the fixed codebook, then one
    * partitioned epoch commit. Idempotent per epoch. */
  def appendEpoch(batch: DataFrame, epoch: Long): Unit = {
    // THE cell mapping (Ann.cellAssign: broadcast codebook cosine,
    // rounded to 6 dp, ties to the lower cell) with the original
    // embedding column carried through — ingest-time assignment and
    // serve-time probe assignment share one spelling by construction
    val assigned = Ann.cellAssign(cents,
        batch.select(col("vec_id"), col("embedding")), 1,
        keep = Seq("embedding"))
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    store.appendEpoch(assigned, epoch)
  }

  /**
   * nprobe-gated cosine top-`k` for each probe vector, served from
   * index files only: the probe side fans out to its `nprobe` nearest
   * cells (broadcast against the codebook), the candidate side reads
   * exactly those cells' directories from the store (the collected
   * cell set is ≤ |probes|·nprobe values — bounded, never data-
   * dependent), and the per-probe rank window orders only the probed
   * cells' candidates. Returns (query_id, cent_id, cand_id, rank,
   * cos) — [[Ann.ivfTopKWith]]'s exact output over the ingested
   * prefix; empty before any data.
   */
  def serve(probes: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    import spark.implicits._
    store.frameIfAny match {
      case None =>
        Seq.empty[(Long, Long, Long, Long, Double)]
          .toDF("query_id", "cent_id", "cand_id", "rank", "cos")
      case Some(fr) =>
        // ONE collect job (bounded at |probes|·nprobe rows) serves
        // both the cell set below and — as a driver-local relation —
        // the broadcast join, with no per-broadcast collect job (the
        // old localCheckpoint + distinct-collect pair paid two jobs
        // plus a collect per broadcast)
        val pFrame = Ann.cellAssign(cents, probes, nprobe)
          .withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("v", "qv").withColumnRenamed("nr", "qn")
        val pRows = pFrame
          .collect() // ≤ |probes|·nprobe rows — bounded by construction
        val p = spark.createDataFrame(
          java.util.Arrays.asList(pRows: _*), pFrame.schema)
        val probeCells = pRows
          .map(_.getAs[Number]("cent_id").longValue()).distinct.toSeq.sorted
        val cand = fr.filter(col("cell").isin(probeCells: _*))
          .select(col("vec_id").as("cand_id"),
            Ann.toDouble(col("embedding")).as("cv"), col("cell"))
          .withColumn("cn", Ann.norm(col("cv")))
        val scored = cand
          .join(broadcast(p), col("cell") === col("cent_id"))
          .filter(col("query_id") =!= col("cand_id"))
          .withColumn("cos",
            round(Ann.cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        scored.withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .select(col("query_id"), col("cent_id"), col("cand_id"),
            col("rank"), col("cos"))
    }
  }

  /** Committed data-file count across all cells — the quantity
    * compaction keeps flat; probes and specs assert on it. */
  def cellFileCount(): Int = store.fileCount

  /** The cell store, for probes and the /diag health surface —
    * telemetry reads only; all writes go through [[appendEpoch]]. */
  private[graft] def cellStore: EpochPartitionedStore = store

  /** Operator-facing index health ([[EpochPartitionedStore.health]]),
    * registered per pipeline on the management plane and served on
    * `/diag/{name}`. */
  def health: Map[String, Double] =
    store.health.map { case (k, v) => k -> v.toDouble }
}
