package graft.ann

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Similarity search over embedding columns (`array<float>`).
 *
 * Two tiers:
 *  - brute-force cosine top-k: exact baseline; a broadcast
 *    nested-loop join — fine when the QUERY side is small (the usual
 *    shape: thousands of probes against billions of candidates,
 *    partitioned by candidate).
 *  - LSH-bucketed (random signed hyperplanes): each vector hashes to a
 *    small bucket id; probes only meet candidates in their bucket, so
 *    the join is an equi-join on bucket — the 100 TB scale path.
 *
 * Dot products fold left-to-right over the array (deterministic IEEE
 * order) so an external oracle reproduces scores bit-for-bit; integer
 * hyperplane weights keep the LSH bucketing exact.
 */
object Ann {

  /**
   * Sequential (index-order) dot product of two double arrays —
   * a codegen'd native expression (see [[graft.functions.DotProduct]]);
   * accumulation order matches the naive left fold bit-for-bit.
   */
  def dot(a: Column, b: Column): Column =
    graft.functions.VectorFunctions.dotProduct(a, b)

  /** Cast float vectors to double once, up front. */
  def toDouble(v: Column): Column = transform(v, x => x.cast("double"))

  /**
   * Pin a PROVABLY-TINY frame (a codebook, a centroid table, a probe
   * set — tens to hundreds of rows by construction) as a driver-local
   * relation: ONE collect job now, then every broadcast of it is
   * built driver-side with NO Spark job — unlike `localCheckpoint()`,
   * whose cached-RDD frame pays a collect job per BroadcastExchange
   * (one per serve call per epoch in the incremental-index loops).
   * Row values are identical to the input's; row ORDER is the collect
   * order, which no consumer may depend on (the same contract the
   * localCheckpoint form had — partition order was arbitrary there
   * too). Do NOT use on anything data-sized: the rows embed in the
   * plan (and in task binaries for non-broadcast uses).
   */
  /** Hard cap enforcing pinTiny's PROVABLY-TINY contract: every
    * current caller pins 8–128 rows (codebooks, centroids, probes);
    * 16k rows is ~100× headroom while still failing fast long before
    * a data-sized frame could OOM the driver or bloat task binaries. */
  val MaxPinRows = 16384

  def pinTiny(df: DataFrame): DataFrame = {
    // limit(cap+1) bounds the collect itself — a misuse on a
    // billions-row frame pulls at most cap+1 rows before the require
    // fires, instead of collecting the whole frame and then failing.
    val rows = df.limit(MaxPinRows + 1).collect()
    require(rows.length <= MaxPinRows,
      s"pinTiny is for provably-tiny frames (<= $MaxPinRows rows); " +
        "this frame has more — use localCheckpoint()/a parquet spill " +
        "for anything data-sized")
    df.sparkSession.createDataFrame(
      java.util.Arrays.asList(rows: _*), df.schema)
  }

  def norm(v: Column): Column = sqrt(dot(v, v))

  def cosine(a: Column, b: Column, normA: Column, normB: Column): Column =
    dot(a, b) / (normA * normB)

  /**
   * Brute-force cosine top-k: for each probe vector, the k nearest
   * candidates by cosine (rounded to 6 dp before ranking so ordering is
   * reproducible), ties broken by candidate id. Ids must be integral.
   *
   * Scale shape: the SMALL probe set is broadcast and the billions-row
   * candidate side streams through partitioned — never the reverse.
   * Each candidate partition is then reduced to its local top-k per
   * probe (a bounded heap), so the final shuffle carries
   * |partitions| × |probes| × k rows instead of |probes| × |candidates|;
   * the global window only re-ranks that reduced set.
   */
  def bruteForceTopK(probes: DataFrame, candidates: DataFrame, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("query_id"),
      toDouble(col("embedding")).as("qv")).withColumn("qn", norm(col("qv")))
    val c = candidates.select(col("vec_id").as("cand_id"),
      toDouble(col("embedding")).as("cv")).withColumn("cn", norm(col("cv")))
    val scored = c.join(broadcast(p), col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
      .select(col("query_id").cast("long"), col("cand_id").cast("long"), col("cos"))
    import scored.sparkSession.implicits._
    // Per-partition bounded top-k: "worst" = lowest cos, then highest
    // cand_id — the exact inverse of the global rank order, so the
    // union of local winners provably contains the global winners.
    val kk = k
    val local = scored.as[(Long, Long, Double)].mapPartitions { it =>
      val worstFirst: Ordering[(Double, Long)] = Ordering.by {
        case (cos, cid) => (-cos, cid)
      }
      val best = scala.collection.mutable.HashMap
        .empty[Long, scala.collection.mutable.PriorityQueue[(Double, Long)]]
      it.foreach { case (q, cid, cos) =>
        val heap = best.getOrElseUpdate(q,
          scala.collection.mutable.PriorityQueue.empty(worstFirst))
        heap.enqueue((cos, cid))
        if (heap.size > kk) heap.dequeue()
      }
      best.iterator.flatMap { case (q, heap) =>
        heap.iterator.map { case (cos, cid) => (q, cid, cos) }
      }
    }.toDF("query_id", "cand_id", "cos")
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    local.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cand_id"), col("rank"), col("cos"))
  }

  /**
   * Signed-hyperplane LSH bucket id over `nBits` pseudo-random integer
   * hyperplanes. Weight of plane j at dimension i (1-based) is
   * `mod(j*2654435761 + i*40503, 2001) - 1000` — pure 64-bit integer
   * arithmetic, reproducible anywhere. Computed by the codegen'd
   * [[graft.functions.LshBucket]] expression (one array pass for all
   * planes, inside WholeStageCodegen).
   */
  def lshBucket(v: Column, nBits: Int): Column =
    graft.functions.VectorFunctions.lshBucket(v, nBits)

  /** Interpreted column formulation of [[lshBucket]] — the spec
    * cross-checks the codegen expression against it bit-for-bit. */
  def lshBucketColumns(v: Column, nBits: Int): Column =
    (0 until nBits).map { j =>
      val proj = aggregate(
        transform(v, (x, i) =>
          x * (pmod(lit(j.toLong) * 2654435761L + (i + 1).cast("long") * 40503L,
            lit(2001L)) - 1000L).cast("double")),
        lit(0.0), (acc, p) => acc + p)
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /**
   * LSH-bucketed ANN: probes meet only same-bucket candidates; top-k
   * per probe within the bucket. Equi-join on bucket → shuffle
   * hash-join at scale instead of a cross product.
   */
  def lshTopK(probes: DataFrame, candidates: DataFrame, nBits: Int, k: Int): DataFrame = {
    val p = probes.select(col("vec_id").as("query_id"),
        toDouble(col("embedding")).as("qv"))
      .withColumn("qn", norm(col("qv")))
      .withColumn("bucket", lshBucket(col("qv"), nBits))
    val c = candidates.select(col("vec_id").as("cand_id"),
        toDouble(col("embedding")).as("cv"))
      .withColumn("cn", norm(col("cv")))
      .withColumn("bucket", lshBucket(col("cv"), nBits))
    val scored = p.join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("bucket"), col("cand_id"), col("rank"), col("cos"))
  }

  /**
   * IVF-style ANN: candidates are bucketed by nearest centroid; each
   * probe searches its `nprobe` nearest cells — the recall knob every
   * real IVF index exposes (nprobe=1 only sees the probe's own cell and
   * misses neighbors that assigned across a cell boundary; raising it
   * trades linearly more candidate comparisons for recall). Centroids
   * here are the first `nList` vectors by id — deterministic stand-ins
   * for a k-means codebook (training the codebook is an offline job;
   * the assign/probe dataflow, which is what must scale, is identical).
   * Assignment is a broadcast join against the tiny centroid set; the
   * probe join stays an equi-join on cell id with an nprobe-times
   * larger probe side — candidates are never replicated, so the join
   * cost at 100 TB grows with the (small) probe set, not the corpus.
   */
  def ivfTopK(probes: DataFrame, candidates: DataFrame, nList: Int, k: Int,
      nprobe: Int = 1): DataFrame =
    ivfTopKWith(
      candidates.filter(col("vec_id") < nList)
        .select(col("vec_id").as("cent_id"), toDouble(col("embedding")).as("ce")),
      probes, candidates, k, nprobe)

  /** IVF search over an EXTERNAL codebook (cent_id, ce: array<double>)
    * — e.g. [[kmeansCentroids]] output — the production shape where
    * the codebook is trained offline and reused across queries. */
  def ivfTopKWith(centroids: DataFrame, probes: DataFrame,
      candidates: DataFrame, k: Int, nprobe: Int = 1): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("ce"))
      .withColumn("cnr", norm(col("ce")))
    val c = cellAssign(cents, candidates, 1)
      .withColumnRenamed("vec_id", "cand_id")
      .withColumnRenamed("v", "cv").withColumnRenamed("nr", "cn")
    val p = cellAssign(cents, probes, nprobe)
      .withColumnRenamed("vec_id", "query_id")
      .withColumnRenamed("v", "qv").withColumnRenamed("nr", "qn")
    val scored = p.join(c, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
      .withColumn("cos", round(cosine(col("qv"), col("cv"), col("qn"), col("cn")), 6))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("cent_id"), col("cand_id"), col("rank"), col("cos"))
  }

  /**
   * Metadata-filtered IVF search — the 100 TB hybrid-search shape:
   * the structured predicate rides INSIDE the cell probe. Candidates
   * are cell-assigned exactly as [[ivfTopKWith]] (the index is built
   * on the full corpus, offline), the probe selects its nprobe cells,
   * and the `keep` id set prunes candidates at the cell gate — BEFORE
   * any exact scoring — so filter selectivity can never re-inflate
   * the candidate set back to a corpus scan (the e17 prefilter+exact
   * baseline rescans the filtered corpus per query batch; this form
   * touches only probed cells). `keep` is one id column, joined
   * left-semi: an O(matching-ids) keyed join, not a broadcast — at
   * scale the filter side may be most of the corpus.
   */
  def ivfFilteredTopKWith(centroids: DataFrame, probes: DataFrame,
      candidates: DataFrame, keep: DataFrame, k: Int,
      nprobe: Int = 1): DataFrame = {
    // Cell assignment is per-row, so semi-joining the candidate frame
    // on the keep ids before [[ivfTopKWith]] is plan-identical to
    // filtering after assignment — one body to maintain, and Catalyst
    // places the semi-join against the assigned/probed candidate scan
    // either way (pinned in PlanSpec).
    val keepIds = keep.select(keep.columns.head).toDF("vec_id")
    ivfTopKWith(centroids, probes,
      candidates.join(keepIds, Seq("vec_id"), "left_semi"), k, nprobe)
  }

  /** Attach each vector's `n` nearest cell ids (one output row per
    * cell): broadcast join against the tiny centroid relation, cosine
    * rounded to 6 dp, ties to the lower cell — the ONE spelling of
    * the cell mapping shared by [[ivfTopKWith]], [[ivfPqTopK]], and
    * the incremental vector index's ingest-time assignment (which
    * must agree bit for bit with the serve-time probe assignment).
    * Returns (vec_id, `keep`..., v, nr, cent_id); `keep` names input
    * columns carried through unchanged. */
  private[graft] def cellAssign(cents: DataFrame, df: DataFrame, n: Int,
      keep: Seq[String] = Nil): DataFrame = {
    val v = df.select(col("vec_id") +: keep.map(col) :+
        toDouble(col("embedding")).as("v"): _*)
      .withColumn("nr", norm(col("v")))
    val scored = v.join(broadcast(cents), lit(true))
      .withColumn("acos", round(cosine(col("v"), col("ce"), col("nr"), col("cnr")), 6))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("acos").desc, col("cent_id"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") <= n)
      .select(col("vec_id") +: keep.map(col) ++:
        Seq(col("v"), col("nr"), col("cent_id")): _*)
  }

  /**
   * IVF cell-balance audit: per-cell occupancy of the index's
   * nearest-cell assignment, with each cell's share of the corpus and
   * its `balance` ratio vs a uniform spread (n · k / total). Run after
   * training and before serving: a hot cell (balance ≫ 1) bounds every
   * search that probes it — the IVF counterpart of a skewed shuffle
   * key — and an empty cell (included via the left join; the groupBy
   * alone would drop it) is a wasted probe and a sign the trainer
   * collapsed centroids.
   *
   * Scale shape: the corpus streams through the same broadcast-
   * centroid cosine pass as [[ivfTopKWith]]'s candidate side, then
   * collapses to one row per cell in a partial-agg groupBy; the
   * windows run over the k-row cell frame only, never raw vectors.
   */
  def ivfCellStats(centroids: DataFrame, df: DataFrame): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("ce"))
      .withColumn("cnr", norm(col("ce")))
    val counts = cellAssign(cents, df, 1)
      .groupBy(col("cent_id").as("cell")).agg(count(lit(1)).as("n"))
    val per = cents.select(col("cent_id").as("cell"))
      .join(counts, Seq("cell"), "left")
      .select(col("cell"), coalesce(col("n"), lit(0L)).as("n_vectors"))
    val all = Window.partitionBy(lit(1))
    per
      .withColumn("total", sum(col("n_vectors")).over(all))
      .withColumn("n_cells", count(lit(1)).over(all))
      .select(col("cell"), col("n_vectors"),
        round(col("n_vectors").cast("double") /
          col("total").cast("double"), 6).as("cell_frac"),
        round(col("n_vectors").cast("double") * col("n_cells").cast("double") /
          col("total").cast("double"), 6).as("balance"))
  }

  /**
   * Embedding near-duplicate pairs via LSH buckets: pairs meet only
   * inside their signed-hyperplane bucket, so the self-join is an
   * EQUI-join on bucket (shuffle hash/sort-merge at scale) — never an
   * all-pairs product over the corpus. Near-duplicates project to the
   * same side of almost every hyperplane, so recall at high thresholds
   * is excellent; the same trade d04 makes by gating Jaccard through
   * the d03 LSH candidates.
   */
  def cosinePairs(df: DataFrame, threshold: Double, nBits: Int = 4): DataFrame = {
    val v = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .withColumn("bucket", lshBucket(col("v"), nBits))
    v.as("a").join(v.as("b"),
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(cosine(col("a.v"), col("b.v"), col("a.n"), col("b.n")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }

  /**
   * Symmetric int8 quantization of an embedding column — the standard
   * storage/serving compression for training corpora (4× smaller than
   * float32): per-vector scale = 127 / max|x|, q_i = ⌊x_i·scale + ½⌋.
   * Pure column expressions (one narrow pass, no shuffle); an all-zero
   * vector quantizes to zeros with scale 0. `floor(x+0.5)` (round half
   * toward +∞) is used instead of round() because its IEEE semantics
   * are identical across engines.
   */
  def quantizeInt8(df: DataFrame): DataFrame = {
    val withMax = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("max_abs", array_max(transform(col("v"), x => abs(x))))
    withMax.select(
      col("vec_id"),
      when(col("max_abs") === 0.0, lit(0.0))
        .otherwise(lit(127.0) / col("max_abs")).as("scale"),
      when(col("max_abs") === 0.0,
        transform(col("v"), _ => lit(0)))
        .otherwise(transform(col("v"),
          x => floor(x * (lit(127.0) / col("max_abs")) + 0.5).cast("integer")))
        .as("qvec"))
  }

  /**
   * Recall@k of an approximate ANN result against the exact truth set
   * — the measurement every real ANN deployment runs before trusting
   * an index (and re-runs when tuning nBits/nList/nprobe). Both inputs
   * are (query_id, cand_id[, …]) result frames, e.g.
   * [[bruteForceTopK]] as `truth` and [[lshTopK]]/[[ivfTopK]] as
   * `retrieved`.
   *
   * Scale shape: an equi-join on (query_id, cand_id) over two frames
   * that are already only |probes| × k rows — negligible next to the
   * searches themselves.
   */
  def recallAtK(truth: DataFrame, retrieved: DataFrame): DataFrame = {
    val t = truth.select(col("query_id"), col("cand_id"))
    // A duplicated (query_id, cand_id) pair in `retrieved` would fan
    // out the left join and inflate both n_true and n_hit; top-k
    // outputs are distinct by construction but the API shouldn't
    // depend on it.
    val r = retrieved.select(col("query_id").as("r_qid"),
      col("cand_id").as("r_cid")).dropDuplicates("r_qid", "r_cid")
    t.join(r, col("query_id") === col("r_qid") &&
        col("cand_id") === col("r_cid"), "left")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("n_true"), count(col("r_cid")).as("n_hit"))
      .withColumn("recall",
        round(col("n_hit").cast("double") / col("n_true").cast("double"), 6))
  }

  /**
   * SemDeDup/cluster-pruning building block: the per-label centroid
   * (element-wise mean embedding) and every vector's cosine to its OWN
   * label's centroid — the "how typical is this example of its
   * cluster" score used to prune redundant prototypes (high cos) or
   * mislabeled outliers (low cos) from embedding-clustered corpora.
   *
   * Scale shape: centroids via posexplode → groupBy(label, dim) mean
   * (partial-agg; one row per label × dim crosses the shuffle, never
   * the vectors pairwise), re-assembled into an array with a sorted
   * collect_list over that tiny frame. Scoring joins the corpus to
   * |labels| centroid rows — broadcast by AQE — and runs the codegen'd
   * dot product once per vector.
   */
  def centroidOutlier(df: DataFrame): DataFrame = {
    val v = df.select(col("vec_id"), col("label"),
      toDouble(col("embedding")).as("e"))
    val comps = v.select(col("label"), posexplode(col("e")))
      .groupBy(col("label"), col("pos")).agg(avg(col("col")).as("m"))
    val centroids = comps.groupBy(col("label"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("cm"))
      .select(col("label").as("c_label"),
        transform(col("cm"), x => x.getField("m")).as("c"))
      .withColumn("c_norm", norm(col("c")))
    v.withColumn("v_norm", norm(col("e")))
      .join(broadcast(centroids), col("label") === col("c_label"))
      .select(col("vec_id"), col("label"),
        round(cosine(col("e"), col("c"), col("v_norm"), col("c_norm")), 6)
          .as("centroid_cos"))
  }

  /**
   * Lloyd's k-means over an embedding column — the codebook-training
   * step behind IVF cells ([[ivfTopK]]'s deterministic stand-in
   * centroids become real ones), SemDeDup-style cluster pruning
   * ([[centroidOutlier]]), and topic-balanced corpus mixing.
   * Deterministic everywhere: init centroids are the `k` lowest-id
   * vectors, assignment ranks by `round(‖v−c‖² − ‖v‖², 6)` (the
   * v-independent part of squared L2, so the argmin is identical) with
   * ties to the lower cluster id, and refit centroid components are
   * rounded to 6 dp — the same contract that lets an external engine
   * reproduce every iteration bit-for-bit.
   *
   * Scale shape per iteration: assignment is a broadcast of the tiny
   * (k × dim) centroid table against the streaming corpus — one
   * codegen'd dot-product pass, no shuffle of the vectors; the refit
   * is posexplode → groupBy(cluster, dim) avg, a partial agg whose
   * shuffle carries k·dim rows, never vectors. Iterations multiply
   * passes, not state: nothing driver-side grows with the corpus.
   */
  def kmeans(df: DataFrame, k: Int, iters: Int): DataFrame =
    assignWith(df, kmeansCentroids(df, k, iters))

  /** Cluster assignment under an EXTERNALLY-trained codebook
    * ((cluster, c) rows — e.g. a persisted [[kmeansCentroids]]
    * result): the production composition where the codebook is
    * trained ONCE and every downstream pass (assignment, SemDeDup,
    * IVF cells) reuses it instead of re-running the trainer. */
  def assignWith(df: DataFrame, cents: DataFrame): DataFrame =
    kmeansAssign(
      df.select(col("vec_id"), toDouble(col("embedding")).as("v")), cents)
      .select(col("vec_id"), col("cluster"))

  /** The trained codebook itself: (cluster, c: array<double>) after
    * `iters − 1` refit rounds — feed to [[ivfTopKWith]] or reuse
    * across corpora. */
  def kmeansCentroids(df: DataFrame, k: Int, iters: Int): DataFrame = {
    val v = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val init = v.filter(col("vec_id") < k)
      .select(col("vec_id").cast("int").as("cluster"), col("v").as("c"))
    (1 until iters).foldLeft(init) {
      (cents, _) => kmeansRefit(kmeansAssign(v, cents))
    }
  }

  // score = c·c − 2·v·c: same argmin as squared L2 (‖v‖² is constant
  // per row), fewer float ops to keep cross-engine rounding exact.
  private def kmeansAssign(v: DataFrame, cents: DataFrame): DataFrame = {
    val scored = v.join(broadcast(cents), lit(true))
      .withColumn("score",
        round(dot(col("c"), col("c")) - lit(2.0) * dot(col("v"), col("c")), 6))
    val w = Window.partitionBy(col("vec_id"))
      .orderBy(col("score"), col("cluster"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("v"), col("cluster"))
  }

  private def kmeansRefit(assigned: DataFrame): DataFrame =
    assigned.select(col("cluster"), posexplode(col("v")))
      .groupBy(col("cluster"), col("pos")).agg(avg(col("col")).as("m"))
      .groupBy(col("cluster"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("cm"))
      .select(col("cluster"),
        transform(col("cm"), x => round(x.getField("m"), 6)).as("c"))

  /**
   * SemDeDup (Abbas et al. 2023): semantic near-duplicate pairs found
   * WITHIN k-means clusters — cluster first, then compare only
   * same-cluster pairs, keeping the quadratic step bounded by cluster
   * size instead of corpus size. Composes [[kmeans]] (assignment) with
   * the same rounded-cosine contract as [[cosinePairs]].
   *
   * Scale shape: the pair join is an EQUI-join on cluster id; at
   * 100 TB, k grows with the corpus (SemDeDup uses ~100k clusters) so
   * per-cluster cardinality — and with it the per-key join fan-out —
   * stays bounded. Downstream pruning keeps the lower id of each pair.
   */
  def semDedupPairs(df: DataFrame, k: Int, iters: Int,
      threshold: Double): DataFrame =
    semDedupPairsWith(df, kmeansCentroids(df, k, iters), threshold)

  /** [[semDedupPairs]] under an externally-trained codebook — see
    * [[assignWith]]; the cluster-gated pair join is unchanged. */
  def semDedupPairsWith(df: DataFrame, cents: DataFrame,
      threshold: Double): DataFrame = {
    val assign = assignWith(df, cents)
    val v = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
      .join(assign, Seq("vec_id"))
    v.as("a").join(v.as("b"),
        col("a.cluster") === col("b.cluster") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(cosine(col("a.v"), col("b.v"), col("a.n"), col("b.n")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"),
        col("a.cluster").as("cluster"), col("cos"))
  }

  /**
   * Product quantization codes: the vector is split into `m` equal
   * subspaces and each subvector replaced by the id of its nearest
   * codeword — the compression behind billion-scale ANN serving
   * (n·m·log₂(k)/8 bytes instead of n·dim·4). Codebooks here are the
   * first `k` vectors' subvectors — the deterministic stand-in for a
   * per-subspace k-means codebook ([[kmeans]] trains real ones); the
   * encode dataflow, which is what must scale, is identical.
   * Assignment ranks by the v-independent part of squared L2 rounded
   * to 6 dp, ties to the lower code — the [[kmeans]] contract.
   *
   * Scale shape: the corpus explodes to m subvector rows per vector
   * (a projection, no shuffle), then equi-joins the broadcast
   * (m × k)-row codebook on the subspace id; the argmin is a window
   * over exactly k candidates per (vector, subspace). Nothing scales
   * with corpus size except the one streaming pass.
   */
  def pqCodes(df: DataFrame, m: Int, k: Int): DataFrame = {
    val subs = pqSubvectors(df, m)
    pqEncode(subs, pqCodebook(subs, k))
  }

  /** (vec_id, sub, sv): the m-way subvector split of a vector frame —
    * a projection (explode over a constant m-sequence), no shuffle. */
  def pqSubvectors(df: DataFrame, m: Int): DataFrame = {
    val v = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
    val subLen = (size(col("v")) / m).cast("int")
    v.select(col("vec_id"), explode(sequence(lit(0), lit(m - 1))).as("sub"), col("v"))
      .select(col("vec_id"), col("sub"),
        slice(col("v"), col("sub") * subLen + 1, subLen).as("sv"))
  }

  /** (sub, code, cv) per-subspace codebook: the first `k` vectors'
    * subvectors — the deterministic k-means stand-in of [[pqCodes]]. */
  def pqCodebook(subs: DataFrame, k: Int): DataFrame =
    subs.filter(col("vec_id") < k)
      .select(col("sub"), col("vec_id").cast("int").as("code"), col("sv").as("cv"))

  /**
   * Trained per-subspace PQ codebook (one Lloyd refit per subspace):
   * init from the first `k` vectors' subvectors ([[pqCodebook]]),
   * assign every subvector ([[pqEncode]]), refit each (sub, code) as
   * the 6-dp-rounded per-dim mean — the [[kmeansCentroids]] contract,
   * but all m subspace trainings share ONE corpus pass (the refit
   * groupBy key carries `sub`) instead of running m separate jobs.
   * Codewords that attract no assignments drop out; [[pqEncode]]
   * argmins over the codes that remain.
   */
  def pqTrainCodebook(subs: DataFrame, k: Int): DataFrame = {
    val a1 = pqEncode(subs, pqCodebook(subs, k))
    subs.join(a1, Seq("vec_id", "sub"))
      .select(col("sub"), col("code"), posexplode(col("sv")))
      .groupBy(col("sub"), col("code"), col("pos"))
      .agg(avg(col("col")).as("m"))
      .groupBy(col("sub"), col("code"))
      .agg(sort_array(collect_list(struct(col("pos"), col("m")))).as("cm"))
      .select(col("sub"), col("code"),
        transform(col("cm"), x => round(x.getField("m"), 6)).as("cv"))
  }

  /** Encode a subvector frame against a codebook: nearest codeword per
    * (vector, subspace) by the squared-L2/6-dp/low-code contract. */
  def pqEncode(subs: DataFrame, codebook: DataFrame): DataFrame = {
    val scored = subs.join(broadcast(codebook), Seq("sub"))
      .withColumn("score",
        round(dot(col("cv"), col("cv")) - lit(2.0) * dot(col("sv"), col("cv")), 6))
    val w = Window.partitionBy(col("vec_id"), col("sub"))
      .orderBy(col("score"), col("code"))
    scored.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("vec_id"), col("sub").cast("long").as("sub"), col("code"))
  }

  /**
   * IVF + PQ asymmetric-distance search — the full billion-scale ANN
   * serving composition: trained coarse cells gate WHICH candidates
   * are scored (the [[ivfTopKWith]] cell equi-join), PQ codes decide
   * HOW each is scored. Per query the m·kCode-entry distance table
   * `adc[sub][code] = round(q_sub · cv, 6)` is computed once against
   * the broadcast codebook; a candidate's approximate inner product is
   * the m-term sum of its codes' entries, folded in subspace order so
   * an external engine reproduces the score bit-for-bit.
   *
   * This one-call form runs the OFFLINE encode (cell assignment + PQ
   * codes — the one corpus scan an indexing job performs) and then the
   * online search; a deployment persists the encode output and serves
   * queries through [[ivfPqSearchIndexed]], where no full-precision
   * corpus vector is touched. Scale shape of the search: the ADC
   * table is |q|·m·kCode rows (broadcast); the candidate side
   * contributes only its (vec_id, sub, code) frame — m small integers
   * per vector, the point of PQ — and every join is an equi-join
   * (cell id, then (query, sub, code)).
   */
  def ivfPqTopK(centroids: DataFrame, probes: DataFrame,
      candidates: DataFrame, m: Int, kCode: Int, k: Int,
      nprobe: Int = 1): DataFrame =
    ivfPqTopKWith(centroids,
      pqCodebook(pqSubvectors(candidates, m), kCode),
      probes, candidates, m, k, nprobe)

  /** IVF+PQ over an EXTERNAL PQ codebook (sub, code, cv) — e.g.
    * [[pqTrainCodebook]] output — running BOTH halves in one call:
    * the offline encode pass (candidate cell assignment + PQ codes,
    * the one corpus scan an indexing job performs) feeding
    * [[ivfPqSearchIndexed]], the online half. */
  def ivfPqTopKWith(centroids: DataFrame, codebook: DataFrame,
      probes: DataFrame, candidates: DataFrame, m: Int, k: Int,
      nprobe: Int = 1): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("ce"))
      .withColumn("cnr", norm(col("ce")))
    val candCells = cellAssign(cents, candidates, 1)
      .select(col("vec_id").as("cand_id"), col("cent_id"))
    val codes = pqEncode(pqSubvectors(candidates, m), codebook)
      .withColumnRenamed("vec_id", "cand_id")
    ivfPqSearchIndexed(centroids, codebook, candCells, codes, probes,
      m, k, nprobe)
  }

  /**
   * The ONLINE half of IVF+PQ serving, over precomputed index
   * artifacts: `candCells` (cand_id, cent_id) and `codes`
   * (cand_id, sub, code) are the offline encode pass's output (in
   * production, persisted alongside the codebook and reused by every
   * query). Only PROBE vectors are read full-precision at search
   * time — the per-query ADC table is |q|·m·k rows against the
   * broadcast codebook, and candidates contribute m small integers
   * each, which is the point of PQ at billions of vectors.
   */
  def ivfPqSearchIndexed(centroids: DataFrame, codebook: DataFrame,
      candCells: DataFrame, codes: DataFrame, probes: DataFrame,
      m: Int, k: Int, nprobe: Int = 1): DataFrame = {
    val cents = centroids.select(col("cent_id"), col("ce"))
      .withColumn("cnr", norm(col("ce")))
    val probeCells = cellAssign(cents, probes, nprobe)
      .select(col("vec_id").as("query_id"), col("cent_id"))
    val adc = pqSubvectors(probes, m)
      .withColumnRenamed("vec_id", "query_id").withColumnRenamed("sv", "qsv")
      .join(broadcast(codebook), Seq("sub"))
      .select(col("query_id"), col("sub").cast("long").as("sub"), col("code"),
        round(dot(col("qsv"), col("cv")), 6).as("part"))

    val pairs = probeCells.join(candCells, Seq("cent_id"))
      .filter(col("query_id") =!= col("cand_id"))
    val scored = pairs
      .join(codes, Seq("cand_id"))
      .join(broadcast(adc), Seq("query_id", "sub", "code"))
      .groupBy(col("query_id"), col("cent_id"), col("cand_id"))
      .agg(round(aggregate(
        transform(array_sort(collect_list(struct(col("sub"), col("part")))),
          x => x.getField("part")),
        lit(0.0), (acc, x) => acc + x), 6).as("adc_dot"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("adc_dot").desc, col("cand_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("query_id"), col("cent_id"), col("cand_id"), col("rank"),
        col("adc_dot"))
  }

  /**
   * Exact all-pairs variant of [[cosinePairs]] — O(n²) with a
   * broadcast of the full corpus; small-corpus verification only,
   * never the 100 TB path.
   */
  def cosinePairsExact(df: DataFrame, threshold: Double): DataFrame = {
    val v = df.select(col("vec_id"), toDouble(col("embedding")).as("v"))
      .withColumn("n", norm(col("v")))
    v.as("a").join(broadcast(v.as("b")), col("a.vec_id") < col("b.vec_id"))
      .withColumn("cos",
        round(cosine(col("a.v"), col("b.v"), col("a.n"), col("b.n")), 6))
      .filter(col("cos") >= threshold)
      .select(col("a.vec_id").as("id_a"), col("b.vec_id").as("id_b"), col("cos"))
  }
}
