package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann

/**
 * Incremental IVF+PQ vector index — [[IncrementalVectorIndex]] with
 * the raw-embedding byte cost taken out of the SERVING scan: each
 * ingested vector is stored cell-partitioned with its m-subspace
 * product-quantization CODES (m small integers) next to the raw
 * embedding, and a query is answered in two column-pruned passes
 * over ONLY the probed cells' directories:
 *
 *  1. ADC scan — reads (vec_id, codes, cell): the per-probe
 *     asymmetric-distance table (m·k_code entries against the
 *     broadcast codebook) scores every candidate from its codes
 *     alone. The `embedding` column never leaves parquet here —
 *     column pruning is what PQ buys at 100 TB, where raw float
 *     vectors are the dominant byte cost of the corpus.
 *  2. Re-rank scan — reads (vec_id, embedding) for the ADC top-R
 *     candidates only (a broadcast semi-join of a ≤ |probes|·R row
 *     set against the same cell-pruned directories), exact cosine,
 *     final top-k.
 *
 * Like the plain IVF index, BOTH codebooks are fixed at creation
 * (coarse centroids for the cell gating, the (sub, code, cv) PQ
 * codebook for encoding — [[Ann.pqTrainCodebook]] trains one), so a
 * vector's cell and codes never change and epoch files never
 * reshuffle. Persistence is the shared [[EpochPartitionedStore]]:
 * tiered compaction, snapshot reads, crash recovery — nothing new.
 *
 * ==Codebook drift and the retrain-and-rebuild contract==
 * Fixed codebooks mean a corpus whose distribution drifts away from
 * the training sample degrades SILENTLY: cells stay balanced-looking
 * and serves keep returning k rows, but the ADC ordering predicts the
 * exact ordering less and less, so recall decays with no error
 * anywhere. The observable symptom is rank DISAGREEMENT between the
 * two scores the serve already computes: [[health]] surfaces
 * `adcRankAgreement` — the fraction of the LAST served top-k whose
 * ADC rank was in the front half of the re-rank window (≤ rerank/2).
 * Near 1.0 the codes still rank like the exact metric; a sustained
 * slide toward k/rerank (the value a RANDOM ADC ordering converges
 * to) means the codebooks no longer describe the corpus. The remedy
 * is retrain-and-rebuild, never in-place patching: train fresh
 * codebooks from a current sample ([[Ann.pqTrainCodebook]] /
 * [[Ann.kmeansFit]]), build a NEW index directory by re-ingesting
 * from the raw corpus (cells and codes are derived data; the corpus
 * is the source of truth), and cut serving over when it is caught
 * up — the old store keeps serving reads throughout, exactly like a
 * search-index reindex. Re-encoding in place would mix two code
 * spaces inside one store, and ADC against a mixed space is silently
 * wrong for every pre-retrain row.
 *
 * Serving is MULTI-PROBE by construction (the s28 `serveMulti`
 * contract, which [[IncrementalVectorIndex.serve]] also honors): N
 * standing probes cost ONE pass per scan kind, pruned to the UNION
 * of their probed cells, with per-probe rank windows — never N
 * store reads.
 *
 * Reference surface: the reference has no vector serving; this is
 * the 100 TB-honest storage form of the engine's own e14/e15 batch
 * composition ([[Ann.ivfPqSearchIndexed]] is the scoring half).
 */
final class IncrementalPqIndex(spark: SparkSession, dir: String,
    centroids: DataFrame, codebook: DataFrame, m: Int,
    name: String = "pqidx",
    refreshEvery: Int = DurableIndexView.DefaultRefreshEvery,
    compactEvery: Int = 0) {
  require(m >= 1, s"m must be >= 1, got $m")
  // the two tiny fixed codebooks, pinned DRIVER-LOCAL so every epoch's
  // encode and every serve broadcast them without a per-use collect
  // job (Ann.pinTiny vs the old localCheckpoint: one collect here,
  // zero jobs per BroadcastExchange after)
  private val cents = Ann.pinTiny(centroids.select(col("cent_id"), col("ce"))
    .withColumn("cnr", Ann.norm(col("ce"))))
  private val cb = Ann.pinTiny(
    codebook.select(col("sub"), col("code"), col("cv")))

  private val store = new EpochPartitionedStore(spark, s"$dir/cells",
    "cell", name, refreshEvery, compactEvery)

  // Drift telemetry: the Observations attached to recent serves'
  // final frames (each completed when the CALLER runs an action on
  // it — serving stays fully lazy and its plan unchanged; reads never
  // block). Pending observations live in a small install-ordered
  // QUEUE, not a single slot: serves can be installed faster than
  // they are consumed (standing multi-query serving builds several
  // frames, then acts on them), and a single slot would lose serve
  // A's metric whenever B installed before A was consumed. Every
  // COMPLETED observation folds into lastDrift (newest-installed
  // completed wins) at the next serve and at every health read, so
  // any consumed serve's metric lands regardless of install order —
  // drift monitoring needs the sustained series, not a flapping
  // field. Abandoned serves (never acted on) age out past
  // DriftQueueCap. Volatile: /diag pollers read from other threads.
  private var driftObs: List[(org.apache.spark.sql.Observation, Int, Int)] =
    Nil
  @volatile private var lastDrift: Option[(Double, Int, Int)] = None
  // serves whose metric has LANDED (the observation completes on the
  // listener bus, asynchronously after the caller's action returns —
  // pollers watch this counter instead of guessing at that timing)
  @volatile private var driftConsumed: Long = 0L
  // serializes fold-and-retain against serve's install: an unlocked
  // poller's stale queue write could land AFTER a newer serve
  // installed its observation and silently discard it
  private val driftLock = new Object
  private val DriftQueueCap = 8

  /** Fold every completed drift observation into [[lastDrift]]
    * (incomplete ones stay queued; never blocks — future.value is
    * completed-or-nothing). */
  private def foldDrift(): Unit = driftLock.synchronized {
    val (done, pending) = driftObs.partition {
      case (o, _, _) => o.future.value.isDefined
    }
    // driftObs is newest-first; fold oldest-to-newest so the most
    // recently INSTALLED completed serve ends up on /diag
    done.reverse.foreach { case (o, k, r) =>
      o.future.value.flatMap(_.toOption).foreach { row =>
        val n = row.getAs[Long]("n_topk")
        if (n > 0)
          lastDrift = Some(
            (row.getAs[Long]("adc_front").toDouble / n.toDouble, k, r))
      }
      driftConsumed += 1
    }
    driftObs = pending.take(DriftQueueCap)
  }

  /** Fold one ingest batch (`vec_id`, `embedding`) into the index:
    * nearest-cell assignment + PQ encode against the fixed codebooks
    * (one row per vector: codes inlined as an m-array in subspace
    * order), then one partitioned epoch commit. Idempotent per
    * epoch. */
  def appendEpoch(batch: DataFrame, epoch: Long): Unit = {
    val b = batch.select(col("vec_id"), col("embedding"))
    val assigned = Ann.cellAssign(cents, b, 1, keep = Seq("embedding"))
      .select(col("vec_id"), col("embedding"), col("cent_id").as("cell"))
    // (vec_id, codes): pqEncode's long form rolled up, subspace order
    // fixed by the sort so posexplode at serve time recovers `sub`
    val codes = Ann.pqEncode(Ann.pqSubvectors(b, m), cb)
      .groupBy(col("vec_id"))
      .agg(transform(
        array_sort(collect_list(struct(col("sub"), col("code")))),
        x => x.getField("code")).as("codes"))
    store.appendEpoch(assigned.join(codes, Seq("vec_id")), epoch)
  }

  /**
   * nprobe-gated ANN top-`k` for each probe vector: ADC over the
   * probed cells' code columns (top `rerank` candidates per probe,
   * scored from codes alone — bit-identical to
   * [[Ann.ivfPqSearchIndexed]] over the ingested prefix), then exact
   * cosine over ONLY those candidates' raw embeddings. Returns
   * (query_id, cand_id, rank, cos); empty before any data.
   */
  def serve(probes: DataFrame, k: Int, nprobe: Int = 1,
      rerank: Int = 0): DataFrame = {
    import spark.implicits._
    val r = if (rerank > 0) rerank else 2 * k
    store.frameIfAny match {
      case None =>
        Seq.empty[(Long, Long, Long, Double)]
          .toDF("query_id", "cand_id", "rank", "cos")
      case Some(fr) =>
        // bounded at |probes|·nprobe rows; ONE collect job serves both
        // the cell set below and (as a driver-local relation) the
        // pairs broadcast — the old localCheckpoint + distinct-collect
        // pair paid two jobs plus a collect per broadcast
        val pFrame = Ann.cellAssign(cents, probes, nprobe)
          .select(col("vec_id").as("query_id"), col("cent_id"))
        val pRows = pFrame
          .collect() // ≤ |probes|·nprobe rows — bounded by construction
        val pAssign = spark.createDataFrame(
          java.util.Arrays.asList(pRows: _*), pFrame.schema)
        val pc = pRows.map(_.get(1).asInstanceOf[Number].longValue())
          .distinct.toSeq.sorted
        val gated = fr.filter(col("cell").isin(pc: _*))
        // pass 1 (ADC): ONE scan reading (vec_id, codes, cell) — the
        // cell rides the code rows into the probe pairs join, and the
        // scoring is [[Ann.ivfPqSearchIndexed]]'s exact literal
        // shapes (adc table, (query, sub, code) equi-join,
        // in-subspace-order fold, 6 dp)
        val codesLong = gated
          .select(col("vec_id").as("cand_id"), col("cell"),
            posexplode(col("codes")))
          .select(col("cand_id"), col("cell"),
            col("pos").cast("long").as("sub"), col("col").as("code"))
        val adc = Ann.pqSubvectors(probes, m)
          .withColumnRenamed("vec_id", "query_id")
          .withColumnRenamed("sv", "qsv")
          .join(broadcast(cb), Seq("sub"))
          .select(col("query_id"), col("sub").cast("long").as("sub"),
            col("code"), round(Ann.dot(col("qsv"), col("cv")), 6).as("part"))
        val scored = codesLong
          .join(broadcast(pAssign), col("cell") === col("cent_id"))
          .filter(col("query_id") =!= col("cand_id"))
          .join(broadcast(adc), Seq("query_id", "sub", "code"))
          .groupBy(col("query_id"), col("cand_id"))
          .agg(round(aggregate(
            transform(array_sort(collect_list(struct(col("sub"), col("part")))),
              x => x.getField("part")),
            lit(0.0), (acc, x) => acc + x), 6).as("adc_dot"))
        val wa = Window.partitionBy(col("query_id"))
          .orderBy(col("adc_dot").desc, col("cand_id"))
        // adc_rn rides into the re-rank join: the drift metric below
        // compares it against the exact rank at zero extra scan cost
        val adcTop = scored.withColumn("rn", row_number().over(wa))
          .filter(col("rn") <= r)
          .select(col("query_id"), col("cand_id"),
            col("rn").cast("long").as("adc_rn"))
        // pass 2 (re-rank): raw embeddings for the bounded ADC-top
        // set only — the scan stays cell-pruned, the candidate set
        // broadcasts
        val qv = probes.select(col("vec_id").as("query_id"),
            Ann.toDouble(col("embedding")).as("qv"))
          .withColumn("qn", Ann.norm(col("qv")))
        val cv = gated.select(col("vec_id").as("cand_id"),
            Ann.toDouble(col("embedding")).as("cv"))
          .withColumn("cn", Ann.norm(col("cv")))
        val exact = cv
          .join(broadcast(adcTop), Seq("cand_id"))
          .join(broadcast(qv), Seq("query_id"))
          .withColumn("cos",
            round(Ann.cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
        val w = Window.partitionBy(col("query_id"))
          .orderBy(col("cos").desc, col("cand_id"))
        // Codebook-drift telemetry (see the class doc's retrain
        // contract): over the final top-k, how often was the ADC rank
        // in the FRONT HALF of the re-rank window? Attached as an
        // observe() so the metric is collected by whatever action the
        // caller runs — serving stays lazy, the two scans' plans are
        // untouched, and an unconsumed serve simply reports nothing.
        val obs = org.apache.spark.sql.Observation()
        val ranked = exact
          .withColumn("rank", row_number().over(w).cast("long"))
          .filter(col("rank") <= k)
          .observe(obs, count(lit(1)).as("n_topk"),
            coalesce(sum((col("adc_rn") <= lit(math.max(1L, r / 2)))
              .cast("long")), lit(0L)).as("adc_front"))
        driftLock.synchronized {
          foldDrift() // completed predecessors land before enqueueing
          driftObs = ((obs, k, r)) :: driftObs
        }
        ranked.select(col("query_id"), col("cand_id"), col("rank"),
          col("cos"))
    }
  }

  /** Committed data-file count across all cells — the quantity
    * compaction keeps flat; probes and specs assert on it. */
  def cellFileCount(): Int = store.fileCount

  /** The cell store, for probes and the /diag health surface —
    * telemetry reads only; all writes go through [[appendEpoch]]. */
  private[graft] def cellStore: EpochPartitionedStore = store

  /** Operator-facing index health ([[EpochPartitionedStore.health]])
    * plus codebook-drift telemetry from the last CONSUMED serve:
    * `adcRankAgreement` (fraction of the final top-k whose ADC rank
    * was ≤ rerank/2 — sliding toward k/rerank means the fixed
    * codebooks no longer describe the corpus; see the class doc's
    * retrain-and-rebuild contract) with its `driftTopK`/`driftRerank`
    * window so the floor is computable by the reader. Registered per
    * pipeline on the management plane and served on `/diag/{name}`;
    * reads never block (getOrEmpty) and never run a Spark job. */
  def health: Map[String, Double] = {
    val base = store.health.map { case (k, v) => k -> v.toDouble }
    foldDrift() // never blocks: future.value is completed-or-nothing
    base ++ Seq("driftConsumedServes" -> driftConsumed.toDouble) ++
      lastDrift.toSeq.flatMap { case (a, k, r) =>
        Seq("adcRankAgreement" -> a,
          "driftTopK" -> k.toDouble, "driftRerank" -> r.toDouble)
      }
  }
}
