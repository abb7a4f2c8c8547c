package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.optimizer.{BuildLeft, BuildRight}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

import graft.SparkEntry
import graft.SparkTestBase

/**
 * Plan-shape regression tests: the properties that make these queries
 * viable at 100 TB must survive to the executed plan, not live in
 * comments. Each assertion here is something a reviewer would
 * otherwise have to check by hand in .explain output.
 */
class PlanSpec extends SparkTestBase {

  private def planOf(name: String): SparkPlan = {
    val df: DataFrame = SparkEntry.queries(name)(spark, sf("0.01"))
    df.queryExecution.executedPlan
  }

  /** Visit every node exactly once, descending through AQE wrappers. */
  private def flatten(n: SparkPlan): Seq[SparkPlan] = n match {
    case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
    case _ => n +: n.children.flatMap(flatten)
  }

  private def collectAll[A](p: SparkPlan)(pf: PartialFunction[SparkPlan, A]): Seq[A] =
    flatten(p).collect(pf)

  private def scanFilters(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf("0.01"))
    df.queryExecution.executedPlan.toString
  }

  test("q17 TTL filter pushes a native-ts-space range into the parquet scan") {
    // The cutoff is rewritten into the FILE's own ts space (currently
    // timestamp[us]/NTZ) so the range predicate reaches PushedFilters
    // and prunes row groups — not a post-scan filter on a derived col.
    val plan = scanFilters("q17_ttl_filter")
    assert(plan.contains("PushedFilters"))
    assert(plan.contains("LessThan(ts,2024-01-08T00:00"),
      "the TTL cutoff must reach the scan as a timestamp-space range; " +
        s"got plan:\n${plan.take(4000)}")
  }

  test("q32 salted agg keeps the two-phase salted rollup in the plan") {
    // skew defense: phase 1 groups on (key, __salt) — hot keys land on
    // `salts` reducers — phase 2 re-aggregates per key. Each phase has
    // its own partial/final split, so the executed plan must carry at
    // least 3 HashAggregate levels and the salt must reach phase 1's
    // grouping. A plan that collapsed to a single groupBy(key) would
    // re-concentrate the hot key on one reducer at 100 TB.
    val p = planOf("q32_salted_agg")
    val plan = p.toString
    assert("HashAggregate".r.findAllIn(plan).size >= 3,
      "two-phase salted aggregation must keep >=3 HashAggregate levels")
    // the optimizer inlines __salt as a grouping expression; what must
    // survive is a phase-1 exchange partitioned on BOTH the key and the
    // salt expression (one key alone = hot key on one reducer)
    assert("hashpartitioning\\(event_type[^)]*_groupingexpression".r
        .findFirstIn(plan).isDefined || plan.contains("__salt"),
      "phase 1 must hash-partition on (key, salt), not the key alone")
  }

  test("q34 salted join is an equi-join on (key, salt), never a product") {
    // The build side replicates `salts`x and the join key widens to
    // (key, __salt) — the plan must stay an equi-join including the
    // salt, with no product-join degradation.
    val p = planOf("q34_salted_join")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "salted join must remain an equi-join")
    assert(plan.contains("__salt"),
      "join keys must include the salt column")
  }

  test("q21 star join broadcasts every dimension (no shuffle join)") {
    val p = planOf("q21_revenue_by_nation")
    val broadcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(broadcasts.size >= 3, s"expected 3 broadcast joins, got ${broadcasts.size}")
  }

  test("q33 as-of join shuffles at most once (no range-join explosion)") {
    val p = planOf("q33_asof_join")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"union+window as-of must not multiply shuffles: ${shuffles.size}")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "as-of join must not degrade to a product join")
  }

  test("d03 LSH candidate join is an equi-join on (band, bandHash)") {
    val plan = planOf("d03_lsh_candidates").toString
    assert(!plan.contains("CartesianProduct"),
      "LSH candidates must never be an all-pairs product")
    assert(plan.contains("band"), "join keys must include the band")
  }

  test("q03 hash-shard filter stays in the scan stage (codegen, no shuffle)") {
    val p = planOf("q03_hash_shard")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty, "a pure shard filter must not shuffle")
  }

  test("e01 near-dup pairs is a bucket equi-join, never an all-pairs product") {
    val plan = planOf("e01_cosine_pairs").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "cosine pairs must go through LSH buckets, not an all-pairs join")
  }

  test("e02 brute-force ANN broadcasts the probe side, streams candidates") {
    val p = planOf("e02_ann_brute")
    val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.nonEmpty, "brute-force scoring is a broadcast NLJ by design")
    bnlj.foreach { b =>
      val buildChild = b.buildSide match {
        case BuildRight => b.right
        case BuildLeft => b.left
      }
      assert(buildChild.output.map(_.name).contains("query_id"),
        s"broadcast side must be the (small) probe relation, " +
          s"got: ${buildChild.output.map(_.name).mkString(",")}")
    }
  }

  test("d04 Jaccard verify stays candidate-gated without a forced broadcast") {
    val p = planOf("d04_jaccard_pairs")
    val plan = p.toString
    // The shingle join must be gated through the LSH candidate pairs as
    // a plain equi-join — never an all-pairs product. Crucially we do
    // NOT require a BroadcastHashJoin: at 100 TB the candidate set can
    // exceed any broadcast limit, so the plan must stay valid when AQE
    // picks a shuffle join instead.
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "Jaccard verify must join shingles through candidates, not all-pairs")
    assert(plan.contains("doc_a") && plan.contains("doc_b"),
      "join keys must be the candidate doc ids")
  }

  test("q01 aggregation has a map-side partial before the exchange") {
    val plan = planOf("q01_flow_agg").toString
    // partial agg appears below the exchange: two HashAggregate levels
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected")
  }

  test("d11 stratified sample is a shuffle-free codegen filter") {
    val p = planOf("d11_stratified_sample")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      "per-row hash sampling must not shuffle — executors sample independently")
  }

  test("d12 mixture weights aggregate before the global window") {
    val plan = planOf("d12_domain_mix").toString
    // the raw corpus is collapsed by a partial/final groupBy(source)
    // BEFORE the single-partition window ever sees a row
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected below the window")
  }

  test("t08 repetition stats keep keyed partial aggregation, no product joins") {
    val plan = planOf("t08_repetition").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "repetition stats must stay keyed on doc_id")
  }

  test("e07 recall join never degrades to a product join") {
    val plan = planOf("e07_lsh_recall").toString
    assert(!plan.contains("CartesianProduct"),
      "recall is an equi-join on (query_id, cand_id)")
  }

  test("p01 sequence packing never runs an unpartitioned window over raw docs") {
    val p = planOf("p01_seq_pack")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.size == 2, s"two-phase prefix sum = two windows, got ${windows.size}")
    val (global, partitioned) = windows.partition(_.partitionSpec.isEmpty)
    assert(partitioned.size == 1 && partitioned.head.partitionSpec.nonEmpty,
      "the intra-bucket running sum must be partitioned by bucket")
    // The single-partition window may only see the per-bucket AGGREGATE
    // (one row per bucketSize docs), never the raw corpus.
    global.foreach { w =>
      val aggBelow = collectAll(w) {
        case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
      }
      assert(aggBelow.nonEmpty,
        "the global window must sit above the per-bucket aggregation")
    }
  }

  test("p02 corpus shuffle ranks within shards (partitioned window only)") {
    val p = planOf("p02_corpus_shuffle")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "shuffle rank must be per-shard — a global rank window cannot scale")
  }

  test("q39 forward as-of join shuffles at most once (mirror of q33)") {
    val p = planOf("q39_asof_forward")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.size <= 2,
      s"union+window forward as-of must not multiply shuffles: ${shuffles.size}")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "forward as-of join must not degrade to a product join")
  }

  test("d15 quota sample compiles to a WindowGroupLimit partial top-k") {
    val plan = planOf("d15_quota_sample").toString
    assert(plan.contains("WindowGroupLimit"),
      "rank<=quota must push a per-task group limit below the shuffle — " +
        "without it every stratum's full row set crosses the exchange")
  }

  test("q40 interval join is a bucketized equi-join, never a product join") {
    val p = planOf("q40_interval_join")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "a raw range predicate degenerates to BNLJ — bucketizing must prevent it")
    assert(plan.contains("bucket"), "join keys must include the time bucket")
  }

  test("q41 rollup shares one scan via Expand with a partial-agg split") {
    val plan = planOf("q41_rollup").toString
    assert(plan.contains("Expand"),
      "rollup must compile to one Expand pass, not one scan per grouping level")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected above the Expand")
  }

  test("e09 kmeans broadcasts the centroid table, never shuffles vectors pairwise") {
    val p = planOf("e09_kmeans")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct"),
      "assignment must broadcast centroids, not build a shuffled product")
    val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.nonEmpty, "centroid assignment is a broadcast NLJ by design")
    bnlj.foreach { b =>
      val buildChild = b.buildSide match {
        case BuildRight => b.right
        case BuildLeft => b.left
      }
      assert(buildChild.output.map(_.name).contains("cluster"),
        s"broadcast side must be the (tiny) centroid relation, " +
          s"got: ${buildChild.output.map(_.name).mkString(",")}")
    }
  }

  test("e13 kmeans-codebook IVF keeps the broadcast-assign + cell-join shape") {
    val p = planOf("e13_ivf_kmeans")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct"),
      "codebook assignment must broadcast, not shuffle a product")
    val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.nonEmpty, "centroid/codebook assignment is a broadcast NLJ")
  }

  test("t10 token entropy keeps the keyed partial-agg shape") {
    val plan = planOf("t10_entropy").toString
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected on the (doc, token) rollup")
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"))
  }

  test("p03 length buckets rank within buckets (partitioned window only)") {
    val p = planOf("p03_length_buckets")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "batch numbering must be per-bucket — a global rank window cannot scale")
  }

  test("q42 rolling frame and q43 sessionize run partitioned windows only") {
    for (name <- Seq("q42_rolling_window", "q43_sessionize")) {
      val p = planOf(name)
      val windows = collectAll(p) {
        case w: org.apache.spark.sql.execution.window.WindowExec => w
      }
      assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
        s"$name: every window must be partitioned by user_id — " +
          "a global ordered window cannot scale")
    }
  }

  test("e10 semdedup pair join is an equi-join on cluster, no product") {
    val p = planOf("e10_semdedup")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct"),
      "within-cluster pairs must equi-join on the cluster id")
    // the only BNLJs allowed are the kmeans centroid broadcasts
    val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    bnlj.foreach { b =>
      val buildChild = b.buildSide match {
        case BuildRight => b.right
        case BuildLeft => b.left
      }
      assert(buildChild.output.map(_.name).contains("cluster"),
        "any broadcast NLJ must be the tiny centroid relation")
    }
  }

  test("q44 grouping sets share one Expand pass like q41") {
    val plan = planOf("q44_grouping_sets").toString
    assert(plan.contains("Expand"),
      "grouping sets must compile to one Expand pass over a single scan")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected above the Expand")
  }

  test("e11 PQ encode joins the broadcast codebook, never a product") {
    val p = planOf("e11_pq_codes")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "subvector encode must equi-join the codebook on the subspace id")
    val broadcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(broadcasts.nonEmpty, "the (m × k)-row codebook must broadcast")
  }

  test("d16 minhash quality stays candidate-gated (no product joins)") {
    val plan = planOf("d16_minhash_quality").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "estimate and truth must both join through the LSH candidate pairs")
  }

  test("d16/d18 audits read the spilled signature frames, not the corpus") {
    // The materialize-once contract: every dedup audit is equi-joins
    // over the shared signature/shingle frames — the corpus parquet is
    // scanned by the one signaturesSpilled() pass, never again per
    // audit. The frames live in a parquet spill (graft_sigs_*), not
    // the block cache: round 7 measured the deserialized row cache of
    // the exploded token/shingle frames starving the rest of the
    // suite. A graft_sigs FileScan == spill hit; a documents.parquet
    // FileScan in an audit == a corpus re-scan.
    for (name <- Seq("d16_minhash_quality", "d18_signal_agreement",
        "d20_fuzzy_decontam")) {
      val p = planOf(name)
      val spillScans = collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("graft_sigs")) => s
      }
      assert(spillScans.nonEmpty,
        s"$name must read the spilled signature frames")
      val corpusScans = collectAll(p) {
        case s: org.apache.spark.sql.execution.FileSourceScanExec
            if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
      }
      assert(corpusScans.isEmpty,
        s"$name must not re-scan the corpus parquet")
    }
  }

  test("d19 searches the persisted parquet band index, never corpus text") {
    // The incremental-dedup contract: the corpus side of the search is
    // the durable band index (a parquet FileScan), the batch side the
    // cached signature frames; the only documents.parquet touch is the
    // pruned batch id projection — corpus text is never rescanned.
    val p = planOf("d19_index_dedup")
    val idxScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_band_index")) => s
    }
    assert(idxScans.nonEmpty, "the search must read the persisted band index")
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_sigs")) => s
    }.nonEmpty, "batch bands must come from the shared signature spill")
    val docScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }
    assert(docScans.size <= 1,
      "only the batch id projection may touch documents.parquet")
    docScans.foreach(s => assert(s.output.map(_.name) == Seq("doc_id"),
      "the one documents scan must be pruned to the id column"))
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "index search is equi-joins on (band, bh) only")
  }

  test("t25 serves BM25 from the lexical index with bucket pruning, no corpus scan") {
    // The build-once/serve-many contract: the query plan reads ONLY
    // index files — postings pruned to the query terms' hash buckets
    // at the PARTITION level (unvisited buckets' directories never
    // open), the term set pushed into the visited buckets' scans —
    // and documents.parquet appears nowhere.
    val p = planOf("t25_bm25_index_serve")
    val postingScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingScans.nonEmpty, "scoring must read the postings index")
    postingScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        "the term-bucket predicate must prune postings partitions")
      assert(s.dataFilters.exists(_.references.exists(_.name == "term")),
        "the term set must push into the visited buckets' scans")
    }
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }.isEmpty, "the index-served plan must never touch the corpus")
  }

  test("t26 multi-query BM25 reads the postings index exactly once") {
    // the point of the batch API: Q queries must NOT open the bucket
    // files Q times. One pruned postings scan (df comes from a window
    // over it, never a second read), no corpus scan, and the per-query
    // rank window is partitioned (Q-way parallel, never global).
    val p = planOf("t26_bm25_multi")
    val postingScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingScans.size == 1,
      s"expected exactly one postings scan, got ${postingScans.size}")
    postingScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        "the union term-bucket predicate must prune postings partitions")
      assert(s.dataFilters.exists(_.references.exists(_.name == "term")),
        "the union term set must push into the visited buckets' scans")
    }
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }.isEmpty, "the index-served plan must never touch the corpus")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "both the df window and the rank window must be partitioned — " +
        "a global window would serialize Q queries through one task")
  }

  test("s24 incremental lexical index serves with bucket pruning, no corpus scan") {
    // the streaming-maintained store must keep t25's serving
    // contract: the postings scan prunes to the query terms' hash
    // buckets at the PARTITION level, pushes the term set into the
    // visited buckets, and never touches the corpus — both in the
    // fresh-read view state AND after an epoch extension (the
    // basePath leaf-file read must preserve the partition column).
    val dir = java.nio.file.Files.createTempDirectory("plan-ilx-").toString
    val ilx = new graft.streaming.IncrementalLexIndex(spark, dir, name = "p")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    ilx.appendEpoch(docs.limit(40), 0L) // view = fresh read
    ilx.appendEpoch(docs.limit(80), 1L) // view = fresh ∪ epoch-1 leaf read
    val p = ilx.serve(Seq("table", "stream"), 5).queryExecution.executedPlan
    val postingScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingScans.size >= 2,
      "the extended view must scan both the store and the epoch's files")
    postingScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        "the term-bucket predicate must prune postings partitions " +
          s"(scan of ${s.relation.location.rootPaths})")
      assert(s.dataFilters.exists(_.references.exists(_.name == "term")),
        "the term set must push into the visited buckets' scans")
    }
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }.isEmpty, "the index-served plan must never touch the corpus")
  }

  test("s28 serveMulti reads the incremental postings store exactly once") {
    // the live-index counterpart of the t26 pin: Q standing queries
    // must not open the store Q times — one bucket-pruned scan, df
    // from a window over it, no corpus, no un-partitioned window
    val dir = java.nio.file.Files.createTempDirectory("plan-ilxm-").toString
    val ilx = new graft.streaming.IncrementalLexIndex(spark, dir, name = "p")
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(org.apache.spark.sql.functions.col("doc_id"),
        org.apache.spark.sql.functions.col("text"))
    ilx.appendEpoch(docs.limit(60), 0L)
    val p = ilx.serveMulti(Seq(
        "qA" -> Seq("table", "stream"), "qB" -> Seq("join", "hash")), 5)
      .queryExecution.executedPlan
    val postingScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingScans.size == 1,
      s"expected exactly one postings scan, got ${postingScans.size}")
    postingScans.foreach { s =>
      assert(s.partitionFilters.nonEmpty,
        "the union term-bucket predicate must prune postings partitions")
      assert(s.dataFilters.exists(_.references.exists(_.name == "term")),
        "the union term set must push into the visited buckets' scans")
    }
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }.isEmpty, "the index-served plan must never touch the corpus")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      "df and rank windows must be partitioned — never global"))
  }

  test("s26 incremental IVF serves with cell-partition pruning and a broadcast probe") {
    // the IVF contract surviving to the physical plan: the candidate
    // scan reads ONLY the probed cells' directories (PartitionFilters
    // on the cell store), the probe side broadcasts onto it, and the
    // per-probe rank window is partitioned, never global
    val dir = java.nio.file.Files.createTempDirectory("plan-ivx-").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cent_id"),
        graft.ann.Ann.toDouble(
          org.apache.spark.sql.functions.col("embedding")).as("ce"))
    val ivx = new graft.streaming.IncrementalVectorIndex(spark, dir, cents,
      name = "p")
    ivx.appendEpoch(emb.limit(200), 0L)
    val p = ivx.serve(emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 4), k = 3, nprobe = 2)
      .queryExecution.executedPlan
    val cellScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    assert(cellScans.nonEmpty, "the candidate side must read the cell store")
    cellScans.foreach(s => assert(s.partitionFilters.nonEmpty,
      "the probed-cell set must prune cell partitions"))
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "the probe fan-out must broadcast onto the candidate cells")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      "per-probe ranking must never be a global window"))
  }

  test("s26 multi-probe serve reads the cell store exactly once") {
    // the serveMulti contract on the vector side: N standing probes
    // are served from ONE scan of the store pruned to the UNION of
    // their probed cells — never N store reads
    val dir = java.nio.file.Files.createTempDirectory("plan-ivxm-").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cent_id"),
        graft.ann.Ann.toDouble(
          org.apache.spark.sql.functions.col("embedding")).as("ce"))
    val ivx = new graft.streaming.IncrementalVectorIndex(spark, dir, cents,
      name = "p")
    ivx.appendEpoch(emb.limit(200), 0L)
    val p = ivx.serve(emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 4), k = 3, nprobe = 2)
      .queryExecution.executedPlan
    val cellScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    assert(cellScans.size == 1,
      s"4 probes must share ONE cell-store scan, got ${cellScans.size}")
  }

  test("s29 PQ index: ADC scan never reads embeddings; both scans cell-pruned") {
    // the point of PQ at 100 TB surviving to the physical plan: the
    // scoring pass reads (vec_id, codes, cell) — the raw embedding
    // column stays in parquet — and only the bounded re-rank pass
    // reads embeddings; both scans carry the probed-cell
    // PartitionFilters, and each scan kind appears exactly once for
    // the 4 standing probes (the multi-probe contract).
    val dir = java.nio.file.Files.createTempDirectory("plan-ipx-").toString
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val cents = emb.filter(org.apache.spark.sql.functions.col("vec_id") < 8)
      .select(org.apache.spark.sql.functions.col("vec_id").as("cent_id"),
        graft.ann.Ann.toDouble(
          org.apache.spark.sql.functions.col("embedding")).as("ce"))
    val cb = graft.ann.Ann.pqCodebook(
      graft.ann.Ann.pqSubvectors(emb, 8), 16)
    val ipx = new graft.streaming.IncrementalPqIndex(spark, dir, cents, cb,
      m = 8, name = "p")
    ipx.appendEpoch(emb.limit(200), 0L)
    val p = ipx.serve(emb.filter(
        org.apache.spark.sql.functions.col("vec_id") < 4),
        k = 3, nprobe = 2, rerank = 6)
      .queryExecution.executedPlan
    val cellScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    assert(cellScans.size == 2,
      s"expected exactly the ADC scan + the re-rank scan, got ${cellScans.size}")
    cellScans.foreach(s => assert(s.partitionFilters.nonEmpty,
      "every cell-store scan must carry the probed-cell partition filter"))
    val (embScans, codeScans) = cellScans.partition(
      _.schema.fieldNames.contains("embedding"))
    assert(codeScans.size == 1 &&
      codeScans.head.schema.fieldNames.contains("codes"),
      "exactly one scan scores from codes alone")
    assert(!codeScans.head.schema.fieldNames.contains("embedding"),
      "the ADC scan must never read the raw embedding column")
    assert(embScans.size == 1 &&
      !embScans.head.schema.fieldNames.contains("codes"),
      "exactly one (re-rank) scan reads embeddings, without codes")
  }

  test("s31 hybrid multi-query fusion: one postings scan, one ADC scan, one re-rank scan for N queries") {
    // the s31 contract surviving to the FUSED physical plan: Q
    // standing hybrid queries cost one bucket-pruned postings pass
    // (union term set), one cell-pruned ADC pass and one cell-pruned
    // re-rank pass (union probed cells) — never a per-query scan
    // blow-up — with the ADC scan still never reading embeddings and
    // every rank window partitioned.
    val lexDir = java.nio.file.Files.createTempDirectory("plan-hyb-l-").toString
    val vecDir = java.nio.file.Files.createTempDirectory("plan-hyb-v-").toString
    import org.apache.spark.sql.functions._
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(col("doc_id"), col("text"))
    val emb = spark.read.parquet(s"${sf()}/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))
    val cents = emb.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cent_id"),
        graft.ann.Ann.toDouble(col("embedding")).as("ce"))
    val cb = graft.ann.Ann.pqCodebook(graft.ann.Ann.pqSubvectors(emb, 8), 16)
    val ilx = new graft.streaming.IncrementalLexIndex(spark, lexDir, name = "p")
    val ipx = new graft.streaming.IncrementalPqIndex(spark, vecDir, cents, cb,
      m = 8, name = "p")
    ilx.appendEpoch(docs.limit(60), 0L)
    ipx.appendEpoch(emb.limit(200), 0L)
    val lex = ilx.serveMulti(Seq(
        "0" -> Seq("table", "stream"), "1" -> Seq("window", "sort")), 10)
      .select(col("query_id"), col("doc_id"), col("rank").as("lex_rank"))
    val vec = ipx.serve(emb.filter(col("vec_id") < 2), k = 10, nprobe = 2,
        rerank = 20)
      .select(col("query_id").cast("string").as("query_id"),
        col("cand_id").as("doc_id"), col("rank").as("vec_rank"))
    val rw = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("rrf").desc, col("doc_id"))
    val p = lex.join(vec, Seq("query_id", "doc_id"), "full_outer")
      .withColumn("rrf",
        coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
          coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)))
      .withColumn("rank", row_number().over(rw))
      .filter(col("rank") <= 10)
      .queryExecution.executedPlan
    val postingScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("postings")) => s
    }
    assert(postingScans.size == 1,
      s"expected ONE postings scan in the fused plan, got ${postingScans.size}")
    postingScans.foreach(s => assert(s.partitionFilters.nonEmpty,
      "the union term-bucket predicate must prune postings partitions"))
    val cellScans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("cells")) => s
    }
    assert(cellScans.size == 2,
      s"expected the ADC scan + the re-rank scan, got ${cellScans.size}")
    cellScans.foreach(s => assert(s.partitionFilters.nonEmpty,
      "every cell-store scan must carry the probed-cell partition filter"))
    val (embScans, codeScans) = cellScans.partition(
      _.schema.fieldNames.contains("embedding"))
    assert(codeScans.size == 1 &&
      !codeScans.head.schema.fieldNames.contains("embedding"),
      "the fused plan's ADC scan must still score from codes alone")
    assert(embScans.size == 1, "exactly one re-rank scan reads embeddings")
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach(w => assert(w.partitionSpec.nonEmpty,
      "every rank window in the fused plan must be partitioned"))
  }

  test("e14/e15 IVF+PQ score through broadcast codebook/ADC equi-joins") {
    for (name <- Seq("e14_ivf_pq", "e15_ivf_pq_trained")) {
      val p = planOf(name)
      assert(!p.toString.contains("CartesianProduct"),
        s"$name: cell gating + code scoring must never cross-product")
      // the only BNLJs allowed are the tiny centroid-relation broadcasts
      val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
      bnlj.foreach { b =>
        val buildChild = b.buildSide match {
          case BuildRight => b.right
          case BuildLeft => b.left
        }
        assert(buildChild.output.map(_.name).contains("cent_id"),
          s"$name: any broadcast NLJ must be the tiny centroid relation")
      }
      assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
        s"$name: the (m·k)-row codebook and per-query ADC table must broadcast")
    }
  }

  test("t15 bigram window is partitioned per doc, aggs keep partial split") {
    val p = planOf("t15_bigram_logprob")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty && windows.forall(_.partitionSpec.nonEmpty),
      "the lead() bigram window must be partitioned by doc — never global")
    assert("HashAggregate".r.findAllIn(p.toString).size >= 2,
      "pair/context counts must keep the partial/final aggregate split")
  }

  test("d21 mixture materialization broadcasts the weight table, no product") {
    val p = planOf("d21_apply_mixture")
    assert(!p.toString.contains("CartesianProduct"),
      "docs join the per-source weight table by key, never all-pairs")
    assert(collectAll(p) { case b: BroadcastHashJoinExec => b }.nonEmpty,
      "the one-row-per-source weight table must broadcast")
  }

  test("t11 CMS and d17 bloom stay equi-joined sketch lookups, no products") {
    for (name <- Seq("t11_cms_freq", "d17_bloom_prefilter")) {
      val plan = planOf(name).toString
      assert(!plan.contains("CartesianProduct"),
        s"$name: sketch build/probe must never cross-product")
      assert("HashAggregate".r.findAllIn(plan).size >= 2,
        s"$name: sketch cells must collapse with a partial-agg split")
    }
  }

  test("t12 charclass profile is a shuffle-free codegen scan") {
    val p = planOf("t12_charclass")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      "per-row regexp class counts must not shuffle — one narrow scan")
  }

  test("d18 signal agreement stays candidate-gated through both signals") {
    val plan = planOf("d18_signal_agreement").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "union pairs and their Jaccard verify must all be equi-joins")
  }

  test("t13 tfidf ranks within documents (partitioned window, keyed aggs)") {
    val p = planOf("t13_tfidf")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec => w
    }
    assert(windows.nonEmpty)
    val unpartitioned = windows.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty => w
    }
    assert(unpartitioned.isEmpty,
      "the top-k rank must be partitioned by doc_id — never a global sort")
    assert("HashAggregate".r.findAllIn(p.toString).size >= 2,
      "tf/df must keep the partial/final aggregate split")
  }

  test("d14 segment dedup stays keyed (no product join, partial agg split)") {
    val plan = planOf("d14_segment_dedup").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "segment dedup must be keyed on the segment text")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split expected on the segment rollup")
  }

  test("d23 duplicate spans stay keyed on the window hash (no products)") {
    val plan = planOf("d23_dup_spans").toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "span matching must be an equi-join on the window fingerprint")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "first-occurrence keeper needs the min-struct partial-agg split")
  }

  test("t16 gopher rules are a shuffle-free codegen scan") {
    val p = planOf("t16_gopher_rules")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      "all five rules are column expressions — the gate rides the scan")
  }

  test("d22 temperature mixture aggregates before any global step") {
    val plan = planOf("d22_temp_mixture").toString
    // the corpus collapses in a partial/final groupBy(source) before
    // the single-partition total/fold ever sees a row (d12 precedent)
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "partial/final aggregate split must collapse the corpus first")
  }

  test("d24 source matrix rolls up gated pairs over pruned source lookups") {
    val p = planOf("d24_source_dup_matrix")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "pair verification and source enrichment must all be equi-joins")
    assert(collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("graft_sigs")) => s
    }.nonEmpty, "pairs must come from the shared signature spill")
    // the only corpus touches are the two (doc_id, source) lookups
    collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec
          if s.relation.location.rootPaths.exists(_.toString.contains("documents")) => s
    }.foreach(s => assert(s.output.map(_.name).toSet == Set("doc_id", "source"),
      "source lookups must prune the corpus scan to (doc_id, source)"))
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "the matrix rollup must keep the partial/final aggregate split")
  }

  test("t17 chunking is a pure narrow generator — zero shuffles") {
    val p = planOf("t17_chunks")
    val shuffles = collectAll(p) { case s: ShuffleExchangeExec => s }
    assert(shuffles.isEmpty,
      s"chunking must stream documents without a shuffle: ${shuffles.size}")
    assert(p.toString.contains("Generate"),
      "chunks must come from a per-row generator, not a join")
  }

  test("t19 window novelty stays keyed on 8-byte fingerprints") {
    val p = planOf("t19_window_novelty")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      "window sharing must resolve through the fingerprint equi-join")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "doc-count and per-doc rollup must keep the partial/final split")
    assert(!plan.contains("Window"),
      "novelty needs no window function — aggregates only")
  }

  test("t18 quality funnel fuses every gate into ONE corpus scan") {
    val p = planOf("t18_quality_funnel")
    val scans = collectAll(p) {
      case s: org.apache.spark.sql.execution.FileSourceScanExec => s
    }
    assert(scans.size == 1,
      s"langid + Gopher + repetition must ride a single documents scan, " +
        s"got ${scans.size} scans")
    val plan = p.toString
    assert(!plan.contains("Join"),
      "every funnel stage is a column expression — zero joins")
    assert(!plan.contains("Window"),
      "the per-row repetition fold must not introduce a window")
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      "the survivor counts must keep the partial/final aggregate split")
  }

  test("d25 DSIR broadcasts the 64-row ratio table onto the doc buckets") {
    val p = planOf("d25_dsir_weights")
    val plan = p.toString
    assert(!plan.contains("CartesianProduct"),
      "the token-distribution joins must never be products")
    val broadcasts = collectAll(p) { case b: BroadcastHashJoinExec => b }
    assert(broadcasts.nonEmpty,
      "the per-bucket log-ratio table must broadcast, never shuffle the corpus")
    // no global window: totals come from a 1-row aggregate cross join
    assert(!plan.contains("Window"),
      "DSIR must not move the distribution to a single-partition window")
  }

  test("q51 sink contract is a shuffle-free codegen projection") {
    // The producer-record projection (translate → writer schema → hex)
    // is pure column work: at 100 TB it must ride the scan stage with
    // zero exchanges, exactly like the reference's per-record
    // convertToProducerRecord.
    val p = planOf("q51_sink_contract")
    assert(collectAll(p) { case s: ShuffleExchangeExec => s }.isEmpty,
      "sink-row projection must not shuffle")
  }

  test("q52 flow control reads the corpus once and shuffles only by key") {
    // Signal generation explodes send+ack from ONE ranked pass (one
    // scan, one window shuffle by partition key), then the state op
    // shuffles by the same key. No self-union (two scans) and no
    // product joins may reappear.
    val p = planOf("q52_flow_control")
    val plan = p.toString
    val scans = collectAll(p) {
      case f: org.apache.spark.sql.execution.FileSourceScanExec => f
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.size == 1,
      s"send+ack signals must come from a single events scan, got ${scans.size}")
    assert(!plan.contains("CartesianProduct") && !plan.contains("NestedLoop"),
      "flow-control fold must stay keyed")
    assert(collectAll(p) { case s: ShuffleExchangeExec => s }.size <= 2,
      "only the window shuffle and the state-op shuffle are allowed")
  }

  test("q56 change history runs one keyed window, no global ordering") {
    val p = planOf("q56_cdc_history")
    val plan = p.toString
    assert(collectAll(p) { case s: ShuffleExchangeExec => s }.size == 1,
      "history expansion shuffles once, by key")
    // hashpartitioning by key — a global (single-partition) window
    // would appear as SinglePartition exchange
    assert(!plan.contains("SinglePartition"),
      "the lead() window must stay partitioned per key")
  }

  test("q53/q54/q57 keyed control-plane aggs keep the partial-agg split") {
    for (name <- Seq("q53_task_lock", "q54_dir_sink_state", "q57_start_position")) {
      val p = planOf(name)
      val plan = p.toString
      assert(collectAll(p) { case s: ShuffleExchangeExec => s }.size == 1,
        s"$name: one keyed exchange only")
      // min_by/max_by are object aggregates — the partial/final split
      // must still appear so contender/change cardinality never
      // crosses the wire unreduced.
      assert("(Hash|ObjectHashAggregate|SortAggregate)".r.findAllIn(plan).size >= 2,
        s"$name: partial/final aggregate split expected")
    }
  }

  test("t19/d23 window audits read the spilled frame, never rescan the corpus") {
    // The exploded window frame feeds BOTH the per-window aggregate
    // and the join-back. Round 10 ran the corpus's widest scan
    // (tokenize + shingle + explode) twice per call; the fix spills
    // the 16-20-byte frame once to parquet. The executed GATE plan
    // must therefore read only the spill — no corpus file scan and no
    // Generate (explode) node may survive into it.
    for ((name, tag) <- Seq("t19_window_novelty" -> "graft_win_novelty",
        "d23_dup_spans" -> "graft_win_spans")) {
      val plan = planOf(name).toString
      assert(plan.contains(tag),
        s"$name must read its parquet spill; got plan:\n${plan.take(3000)}")
      assert(!plan.contains("documents.parquet"),
        s"$name re-scanned the corpus instead of the spill")
      assert(!plan.contains("Generate"),
        s"$name re-ran the explode that the spill already materialized")
    }
  }

  test("e18 filtered IVF keeps the metadata filter a keyed semi-join inside the probe") {
    val p = planOf("e18_ivf_filtered_ann")
    val plan = p.toString
    // the filter id set must gate candidates as an equi semi-join —
    // never a product, and never by re-scoring the unfiltered corpus
    assert(!plan.contains("CartesianProduct"),
      "filtered IVF must never build a product")
    assert(plan.contains("LeftSemi"),
      "the keep-id filter must compile to a semi-join on the candidate side")
    // cell assignment still broadcasts the tiny centroid relation
    val bnlj = collectAll(p) { case b: BroadcastNestedLoopJoinExec => b }
    assert(bnlj.nonEmpty, "cell assignment is a broadcast NLJ over centroids")
  }

  test("e19 median never orders corpus rows in a single task") {
    // The exact median runs as distributed counting-selection: the
    // only operator touching corpus vectors is the distinct-norm
    // groupBy. Every empty-partition window (bucket totals <= P rows;
    // one bucket's distinct values) must therefore sit ABOVE an
    // aggregate — a window whose subtree has no aggregate would be
    // ordering raw corpus rows in one task, the exact shape this
    // formulation removed.
    val p = planOf("e19_embedding_health")
    val windows = collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "counting-selection keeps its two windows")
    windows.foreach { w =>
      val hasAggBelow = flatten(w).exists(n =>
        n.nodeName.contains("HashAggregate") ||
          n.nodeName.contains("SortAggregate") ||
          n.nodeName.contains("ObjectHashAggregate"))
      assert(hasAggBelow,
        s"window over non-aggregated (corpus-sized) input:\n$w")
    }
  }

  test("t23 BM25 is filtered-postings aggregation plus a distributed top-k") {
    // the scale contract: the query-term predicate gates the exploded
    // postings BEFORE any aggregate (the groupBy must run over
    // |q|-term postings, never the full posting list), the top-k is
    // TakeOrderedAndProject (never a global sort), and the rank
    // window orders only the k-bounded frame.
    val p = planOf("t23_bm25_topk")
    assert(flatten(p).exists(_.nodeName.contains("TakeOrderedAndProject")),
      "top-k must run as TakeOrderedAndProject, not a global sort")
    // the TERM filter itself must have NO aggregate in its own
    // subtree — "some aggregate above it" is vacuously true of the
    // final per-doc groupBy; what the 100 TB contract needs is that
    // the filter runs on the raw exploded postings, i.e. BELOW the
    // bottom-most aggregate
    // match the filter by its SHAPE — a predicate over the exploded
    // `term` column — not by any literal query term, so renaming the
    // gate's terms can never silently vacate this pin
    val termFilters = collectAll(p) {
      case f: org.apache.spark.sql.execution.FilterExec
          if f.condition.references.exists(_.name == "term") => f
    }
    assert(termFilters.nonEmpty, "the term IN (...) filter must exist")
    termFilters.foreach { f =>
      assert(!flatten(f).drop(1).exists(_.nodeName.contains("Aggregate")),
        s"term filter must gate RAW postings (no aggregate beneath it):\n$f")
    }
    collectAll(p) {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }.foreach { w =>
      assert(flatten(w).exists(_.nodeName.contains("TakeOrderedAndProject")),
        s"rank window must order only the k-bounded frame:\n$w")
    }
  }

  test("t21 head is materialized once; only the per-source pass re-tokenizes") {
    // the head's own top-k runs at construction (a distributed
    // TakeOrderedAndProject job whose 50 rows are collected and
    // embedded as literals — a partial top-k, never a global
    // vocabulary sort); the GATE plan must consume the embedded
    // 50 rows, not re-run the corpus tokenize+count per consumer
    val plan = planOf("t21_source_drift").toString
    assert(plan.contains("LocalTableScan") || plan.contains("LocalRelation"),
      "head must be the embedded 50-row literal frame")
    assert("Generate explode".r.findAllIn(plan).size == 1,
      "exactly one tokenize pass (the per-source gate join) may remain; " +
        "more means a head consumer re-derived the corpus counts")
  }
}
