package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.ann.Ann
import graft.dedup.Dedup
import graft.functions.Portable
import graft.multimodal.Multimodal
import graft.packing.Packing
import graft.sampling.Sampling
import graft.sketch.Sketch
import graft.text.Text

/**
 * Training-data pipeline operators (dedup, similarity search, text
 * analysis, multimodal plumbing) over the `documents` and `embeddings`
 * tables, each with a DuckDB oracle reproducing the exact result via
 * the portable (md5-derived) hash and sequential-fold dot products.
 */
object DataOpsQueries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.t(s, dir, name)

  private val MinHashK = 16
  private val LshRows = 4
  private val SimHamming = 10
  private val CmsD = 4
  private val CmsW = 1024
  private val BloomK = 3
  private val BloomM = 65536

  /**
   * Materialize-once dedup signatures, shared across every d-family
   * gate in a run: the first gate that touches the corpus pays for the
   * single tokenize/shingle/MinHash/SimHash pass, and
   * d03/d04/d05/d06/d07/d09/d16/d18 all reuse the shared frames — the
   * production pipeline shape, where signatures are computed once per
   * corpus and every candidate generator and audit is an equi-join
   * over them. Keyed by data directory; recomputed if the session
   * changed (a fresh run's spill paths died with its session).
   *
   * Storage is a PARQUET spill ([[Dedup.signaturesSpilled]]), not the
   * block cache: round 7 held the five frames `.persist()`ed
   * (deserialized, unbounded lifetime) and measured every consumer
   * except d16 SLOWER than recompute, plus a 4–6× slowdown in the
   * streaming gates that ran while the frames stayed pinned — the
   * exploded token/shingle frames squeezed the whole suite's heap.
   * The spill holds zero executor memory between consumers, reads
   * back columnar-compressed, and is scoped: [[release]] deletes it.
   */
  private val sigCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String, Dedup.SignatureSet)]()

  /** Per-corpus, per-JVM scratch dir (same naming contract as the band
    * index: basename + path hash + pid — two corpora or two processes
    * can never collide); deleted on JVM exit and by [[release]]. */
  private def scratchDir(prefix: String, d: String): java.io.File = {
    val base = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    val f = new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${base}_${Integer.toHexString(d.hashCode)}_" +
        ProcessHandle.current().pid)
    Runtime.getRuntime.addShutdownHook(new Thread(() => deleteTree(f)))
    f
  }

  /** The corpus LSH band frame (doc, band, bh) from the shared
    * signature spill — exposed for the streaming band-admission gates
    * (s14/s15), which dedup on EXACTLY this frame (k=MinHashK,
    * r=LshRows): they ride the materialize-once spill instead of each
    * re-running the tokenize→shingle→MinHash corpus pass per run.
    * Same scope contract as every spill consumer: [[release]] ends the
    * corpus's scratch lifetime; the next caller rebuilds. */
  def sharedBands(s: SparkSession, d: String): DataFrame = sigs(s, d).bands

  private def sigs(s: SparkSession, d: String): Dedup.SignatureSet =
    sigCache.compute(d, (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur
      else {
        val dir = scratchDir("graft_sigs", d).getAbsolutePath
        (s, dir, Dedup.signaturesSpilled(s, t(s, d, "documents"),
          col("doc_id"), col("text"), k = MinHashK, shingleN = 3,
          r = LshRows, dir = dir))
      }
    )._3

  /**
   * Release every materialize-once artifact held for data directory
   * `d`: the signature spill and band index parquet directories are
   * deleted, the codebook's cached blocks unpersisted, and all three
   * cache entries dropped — the scope boundary a long-lived
   * multi-corpus deployment needs (nothing accumulates per corpus
   * after its dedup run ends). Suite harnesses (Bench, Verify) call
   * this in teardown; the next [[sigs]]/[[codebook]] call on the same
   * directory simply rebuilds.
   */
  def release(d: String): Unit = {
    Option(sigCache.remove(d)).foreach { case (_, dir, _) =>
      deleteTree(new java.io.File(dir))
    }
    Option(bandIndexCache.remove(d)).foreach { case (_, path) =>
      deleteTree(new java.io.File(path))
    }
    winSpillCache.keySet.toArray.foreach {
      case key: String if key.startsWith(d + "#") =>
        Option(winSpillCache.remove(key)).foreach { case (_, path) =>
          deleteTree(new java.io.File(path))
        }
      case _ => ()
    }
    Option(codebookCache.remove(d)).foreach { case (_, df) =>
      df.unpersist(): Unit
    }
    Option(lexIndexCache.remove(d)).foreach { case (_, path) =>
      deleteTree(new java.io.File(path))
    }
  }

  /**
   * Trained k-means codebook (k=4, iters=2), shared across the
   * e-family gates — the materialize-once counterpart of [[sigs]]
   * for the embedding pipeline: e09 assignment, e10 SemDeDup, and
   * e13 IVF all reuse ONE training run (the persisted k×dim-row
   * centroid table) instead of re-running the two assignment passes
   * per gate, which is how a production deployment composes them.
   */
  private val codebookCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, DataFrame)]()

  private def codebook(s: SparkSession, d: String): DataFrame =
    codebookCache.compute(d, (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur
      else (s, Ann.kmeansCentroids(t(s, d, "embeddings"), k = 4, iters = 2)
        .persist())
    )._2

  /**
   * Durable corpus band index for the incremental-dedup gate (d19):
   * the corpus partition's LSH band signatures written ONCE to parquet
   * and read back by every search — the storage half of the
   * ingest-batch dedup shape ([[Dedup.indexDedupBatch]]). Built from
   * the shared [[sigs]] frames (no extra corpus pass) and keyed by
   * data directory like the other materialize-once caches.
   */
  private val bandIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(): Unit
  }

  private def bandIndexPath(s: SparkSession, d: String): String =
    bandIndexCache.compute(d, (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur
      else {
        // Keyed by basename + full-path hash (two data dirs can never
        // collide onto one index) AND the JVM pid (two processes on
        // one machine can never overwrite each other's index mid-scan
        // — the cache is per-JVM, so the path may as well be too);
        // deleted on JVM exit and by [[release]].
        val path = scratchDir("graft_band_index", d).getAbsolutePath
        sigs(s, d).bands
          .filter(pmod(Portable.hash64(col("doc")), lit(5L)) < 4)
          .write.mode("overwrite").parquet(path)
        (s, path)
      })._2

  /** Materialize-once lexical (BM25) index per (session, corpus) —
    * the t25 serving artifact: postings hive-partitioned by term
    * bucket + docstats + 1-row corpus stats, built by ONE tokenize
    * pass ([[graft.text.Text.buildLexicalIndex]]); same scratch-dir
    * and [[release]] contract as [[bandIndexPath]]. */
  private val lexIndexCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def lexIndexPath(s: SparkSession, d: String): String =
    lexIndexCache.compute(d, (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur
      else {
        val path = scratchDir("graft_lex_index", d).getAbsolutePath
        Text.buildLexicalIndex(
          t(s, d, "documents").select(col("doc_id"), col("text")), path)
        (s, path)
      })._2

  /**
   * Materialize-once window-fingerprint spills for the span/novelty
   * audits (d23/t19): each audit's exploded window frame feeds BOTH
   * its first-occurrence/doc-count aggregate and the join-back, and as
   * a lazy plan the corpus's widest scan (tokenize + shingle +
   * explode) ran twice per call. Spilled once per (session, corpus) to
   * parquet — 16–20-byte rows, columnar-compressed, zero executor
   * memory between consumers — with the same scratch-dir contract as
   * [[sigs]]/[[bandIndexPath]]; [[release]] deletes them.
   */
  private val winSpillCache =
    new java.util.concurrent.ConcurrentHashMap[String, (SparkSession, String)]()

  private def winSpill(s: SparkSession, d: String, name: String)(
      build: => DataFrame): DataFrame = {
    val path = winSpillCache.compute(s"$d#$name", (_, cur) =>
      if (cur != null && (cur._1 eq s)) cur
      else {
        val p = scratchDir(s"graft_win_$name", d).getAbsolutePath
        build.write.mode("overwrite").parquet(p)
        (s, p)
      })._2
    s.read.parquet(path)
  }

  /** Materialize-once LSH candidate pairs (doc_a, doc_b, n_bands):
    * candidate generation runs ONCE per corpus — the production shape
    * (generate candidates once; every verifier, auditor and grouper
    * consumes them) — spilled with the same scratch/release contract
    * as the signature frames. Previously each of d03/d04/d07/d09/d16/
    * d18/d24/d26/d28 re-ran the bands self-join per gate. */
  private def cands(s: SparkSession, d: String): DataFrame =
    winSpill(s, d, "cands")(Dedup.lshCandidatesFromBands(sigs(s, d).bands))

  /** Materialize-once dedup groups (doc, group_id): connected
    * components over the candidate graph, computed ONCE per corpus —
    * d07 emits them, d09 picks canonicals, d26 hashes them into
    * leakage-safe splits. Previously each gate re-ran the iterative
    * min-label propagation (and its localCheckpoint chain). */
  private def dupGroups(s: SparkSession, d: String): DataFrame = {
    // Hoist the candidate spill OUT of winSpill's by-name build block:
    // winSpill evaluates the block inside winSpillCache.compute, and
    // cands() computes ANOTHER key of the SAME map — a nested update
    // CHM.compute forbids ("Recursive update" IllegalStateException
    // when the two keys share a bin). Resolving `c` first makes the
    // nested compute happen before, not inside, the groups compute.
    val c = cands(s, d)
    winSpill(s, d, "groups")(Dedup.connectedComponents(
      t(s, d, "documents").select(col("doc_id").as("doc")),
      c.select(col("doc_a"), col("doc_b")), "doc_a", "doc_b"))
  }

  /** Materialize-once per-doc shingle sizes (doc, n) — referenced
    * TWICE inside every jaccard/containment verify (the na/nb joins),
    * so as a lazy plan the corpus-sized shingle aggregate ran twice
    * per consuming gate (d04/d16/d18/d20/d24/d28). */
  private def shSizes(s: SparkSession, d: String): DataFrame =
    winSpill(s, d, "shsizes")(sigs(s, d).shingles
      .groupBy(col("doc")).agg(count(lit(1)).as("n")))

  /** Force-build every MULTI-CONSUMER dedup artifact for `d` (the
    * signature spill via [[sharedBands]], plus the candidate, group,
    * and shingle-size spills) — the rest of the itemized setup step
    * Bench times as `spill_build`: whichever gate runs first would
    * otherwise absorb each build into its own number (the round-13
    * attribution problem the itemized step exists to prevent).
    * Single-consumer spills (t11/t24) stay inside their gates. */
  def prebuildSharedArtifacts(s: SparkSession, d: String): Unit = {
    cands(s, d)
    dupGroups(s, d)
    shSizes(s, d): Unit
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // Exact dedup: hash-groupBy on content digest.
    "d01_dedup_exact" -> ((s, d) =>
      Dedup.exact(t(s, d, "documents"), col("doc_id"), col("text"))),

    // MinHash signatures, long relational form (doc, i, sig).
    "d02_minhash_sig" -> ((s, d) =>
      Dedup.minHashLong(t(s, d, "documents"), col("doc_id"), col("text"), k = 8)
        .withColumn("i", col("i").cast("long"))),

    // MinHash + LSH banding: near-dup candidate pairs.
    "d03_lsh_candidates" -> ((s, d) => cands(s, d)),

    // Exact n-gram Jaccard verification, gated by LSH candidates —
    // the production near-dup pipeline shape (candidate gen → verify),
    // both stages equi-joins over the shared persisted signature set.
    "d04_jaccard_pairs" -> ((s, d) =>
      Dedup.jaccardForShingles(sigs(s, d).shingles, cands(s, d),
          shSizes(s, d))
        .filter(col("jaccard") >= 0.5)),

    // Asymmetric containment on the same candidates: flags
    // quote-inclusion supersets (small doc contained in a big one)
    // that the symmetric-Jaccard threshold dilutes — the
    // Broder-containment variant, candidate-gated like d04.
    "d28_containment" -> ((s, d) =>
      Dedup.containmentForShingles(sigs(s, d).shingles, cands(s, d),
          shSizes(s, d))
        .filter(col("containment_a") >= 0.8 || col("containment_b") >= 0.8)),

    // 63-bit SimHash fingerprints (from the shared signature set).
    "d05_simhash" -> ((s, d) => sigs(s, d).simhash),

    // SimHash near-dup candidate pairs via 9-bit bands + Hamming
    // verify (candidates feed an exact check like d04 downstream).
    "d06_simhash_pairs" -> ((s, d) =>
      Dedup.simHashPairs(sigs(s, d).simhash, maxHamming = SimHamming)),

    // Dedup groups: connected components over the LSH candidate graph
    // (pairs → duplicate groups; canonical id = min member).
    "d07_dedup_groups" -> ((s, d) => dupGroups(s, d)),

    // Canonical document per dedup group: within each connected
    // component keep the longest doc (ties → lowest id) — the "which
    // copy survives" step that follows group detection in a real
    // dedup pipeline.
    "d09_canonical" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val groups = dupGroups(s, d)
      val joined = groups.join(docs, col("doc") === col("doc_id"))
      val byGroup = Window.partitionBy(col("group_id"))
      joined
        .withColumn("n_docs", count(lit(1)).over(byGroup))
        .withColumn("__rn", row_number().over(
          byGroup.orderBy(col("n_chars").desc, col("doc"))))
        .filter(col("__rn") === 1)
        .select(col("group_id"), col("doc").as("canonical_doc"),
          col("n_chars").as("canonical_chars"), col("n_docs"))
    }),

    // Leakage-safe train/val/test split: the split is decided by the
    // HASH OF THE DEDUP GROUP, not the doc — every member of a
    // near-dup component lands in the same split by construction, so
    // a val/test doc can never have a near-duplicate in train (the
    // leak doc-hash splitting silently allows). Composes the d07
    // component pass with one hash expression — no shuffle beyond
    // connected components itself; 80/10/10 by group-hash decile.
    "d26_leakage_safe_split" -> ((s, d) => {
      val groups = dupGroups(s, d)
      val bucket = pmod(Portable.hash64(col("group_id")), lit(10L))
      groups.select(col("doc"), col("group_id"),
        when(bucket < 8, "train").when(bucket === 8, "val")
          .otherwise("test").as("split"))
    }),

    // Eval-set decontamination: training docs sharing >= 3 distinct
    // shingles with any validation doc (same hash-bucket split as
    // d08). The shingle equi-join is the scale shape — only docs that
    // actually collide on an n-gram ever meet, never all pairs.
    "d10_contamination" -> ((s, d) => {
      val sh = t(s, d, "documents")
        .select(col("doc_id"), graft.text.Text.tokens(col("text")).as("w"))
        .select(col("doc_id"),
          explode(graft.text.Text.shingleSetOf(col("w"))).as("s"))
        .withColumn("b", pmod(Portable.hash64(col("doc_id")), lit(100L)))
      val train = sh.filter(col("b") < 80)
        .select(col("doc_id").as("train_doc"), col("s"))
      val eval = sh.filter(col("b") >= 80 && col("b") < 90)
        .select(col("doc_id").as("eval_doc"), col("s"))
      train.join(eval, "s")
        .groupBy(col("train_doc"), col("eval_doc"))
        .agg(count(lit(1)).as("shared"))
        .filter(col("shared") >= 3)
    }),

    // Deterministic train/val/test split: stable hash of the doc id
    // buckets every row reproducibly (no RNG, no reshuffle drift when
    // the corpus grows) — the standard split for training corpora.
    "d08_train_split" -> ((s, d) => {
      val bucket = pmod(Portable.hash64(col("doc_id")), lit(100L))
      val split = when(bucket < 80, lit("train"))
        .when(bucket < 90, lit("val")).otherwise(lit("test"))
      t(s, d, "documents")
        .groupBy(split.as("split"))
        .agg(count(lit(1)).as("n"), min(col("doc_id")).as("min_doc"))
    }),

    // Deterministic stratified sampling: keep/drop decided by a
    // portable hash of (stratum, id) against a per-stratum rate — no
    // RNG, stable under corpus growth and task replay. A single
    // codegen'd filter, no shuffle.
    "d11_stratified_sample" -> ((s, d) =>
      Sampling.stratifiedSampleDerived(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"))),

    // Domain-mixture weights: per-source token share and the
    // up/down-sampling weight (+ capped integer repeat factor) that
    // would equalize the mixture — the training-data recipe step that
    // follows dedup/quality filtering.
    "d12_domain_mix" -> ((s, d) =>
      Sampling.mixtureWeights(t(s, d, "documents"), col("source"),
        Text.tokenCount(col("text")))),

    // The d12 weights APPLIED: the resampled corpus itself — floor(w)
    // copies per doc plus a deterministic hash-fraction extra copy
    // (and fractional keep for downweighted sources). The reproducible
    // epoch-repeat materialization step between "compute the recipe"
    // (d12) and training.
    "d21_apply_mixture" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Sampling.applyMixture(docs, col("doc_id"), col("source"),
        Sampling.mixtureWeights(docs, col("source"),
          Text.tokenCount(col("text"))))
    }),

    // Cross-source duplication matrix: d04's verified near-dup pairs
    // rolled up to (source, source) — "which sources copy from which",
    // the provenance read a curator takes before deciding what to
    // drop. Pair direction is normalized (least/greatest) so the
    // matrix is triangular; every stage is an equi-join over the
    // shared signature frames plus two broadcast-size id→source joins.
    "d24_source_dup_matrix" -> ((s, d) => {
      val verified = Dedup.jaccardForShingles(sigs(s, d).shingles,
          cands(s, d), shSizes(s, d))
        .filter(col("jaccard") >= 0.5)
      val src = t(s, d, "documents").select(col("doc_id"), col("source"))
      verified
        .join(src.select(col("doc_id").as("doc_a"), col("source").as("src_a")),
          Seq("doc_a"))
        .join(src.select(col("doc_id").as("doc_b"), col("source").as("src_b")),
          Seq("doc_b"))
        .select(least(col("src_a"), col("src_b")).as("source_a"),
          greatest(col("src_a"), col("src_b")).as("source_b"))
        .groupBy(col("source_a"), col("source_b"))
        .agg(count(lit(1)).as("n_dup_pairs"))
    }),

    // DSIR importance weights (Xie et al. 2023): target = the src0
    // slice standing in for the trusted corpus, raw = the full table.
    // Hashed-unigram log-likelihood-ratio per document; the per-bucket
    // log-ratio is floored to integer micro-nats BEFORE the per-doc
    // sum, so the gate hashes exactly in any engine and any
    // accumulation order. Two 64-row partial-agg distributions + one
    // broadcast ratio join — no shuffle ever carries raw tokens beyond
    // the (doc, bucket) partial agg.
    "d25_dsir_weights" -> ((s, d) => {
      val docs = t(s, d, "documents")
      Sampling.dsirWeights(docs, docs.filter(col("source") === "src0"),
        col("doc_id"), col("text"), buckets = 64)
    }),

    // Rolling-window duplicate spans: stride-1 8-token windows, global
    // first-occurrence keeper — catches the cross-boundary duplicated
    // passages d14's fixed segments miss (the exact-substring-dedup
    // approximation of Lee et al. 2021, windows compared by portable
    // 64-bit fingerprint).
    "d23_dup_spans" -> ((s, d) =>
      Dedup.duplicateSpansFromWindows(winSpill(s, d, "spans") {
        Dedup.spanWindows(t(s, d, "documents"), col("doc_id"),
          col("text"), winLen = 8)
      })),

    // Per-doc window novelty (memorization risk): fraction of each
    // doc's distinct 8-token windows that appear in another document
    // — d23's fingerprints turned into a per-doc audit score.
    "t19_window_novelty" -> ((s, d) =>
      Dedup.windowNoveltyFromWindows(winSpill(s, d, "novelty") {
        Dedup.noveltyWindows(t(s, d, "documents"), col("doc_id"),
          col("text"), winLen = 8)
      })),

    // Temperature-scaled mixture (α = ½): the tail-upsampling recipe
    // knob — p^α-tempered target shares and the q/p sampling weight
    // that realizes them. α = ½ computes via sqrt (IEEE-correctly-
    // rounded in every engine); the Σp^α denominator is an
    // order-pinned sequential fold, so the oracle matches to the ulp.
    "d22_temp_mixture" -> ((s, d) =>
      Sampling.temperatureMixture(t(s, d, "documents"), col("source"),
        Text.tokenCount(col("text")))),

    // The curation funnel: the filter chain a corpus curator actually
    // ships — language gate → quality threshold → repetition filter →
    // exact dedup — with cumulative survivor counts per stage. Each
    // stage is one of the engine's gated operators; this query proves
    // they compose in one plan (flags are column predicates except the
    // repetition join, which stays keyed on doc_id).
    "d13_curation_funnel" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val rep = Text.repetitionStats(docs, col("doc_id"), col("text"))
        .select(col("doc_id").as("r_doc"), col("repetitive"))
      val keep = Dedup.exact(docs, col("doc_id"), col("text"))
        .select(col("keep_id"))
      val flagged = docs
        .join(rep, col("doc_id") === col("r_doc"), "left")
        .withColumn("f_lang", col("lang") === "en")
        .withColumn("f_quality",
          col("f_lang") && Text.qualityScore(col("text")) >= 0.5)
        .withColumn("f_rep", col("f_quality") && col("repetitive") === 0)
      val withDedup = flagged
        .join(keep, col("doc_id") === col("keep_id"), "left")
        .withColumn("f_dedup", col("f_rep") && col("keep_id").isNotNull)
      withDedup.agg(
          count(lit(1)).as("n_all"),
          sum(col("f_lang").cast("long")).as("n_lang"),
          sum(col("f_quality").cast("long")).as("n_quality"),
          sum(col("f_rep").cast("long")).as("n_clean"),
          sum(col("f_dedup").cast("long")).as("n_final"))
        .select(
          explode(array(
            struct(lit("1_all").as("stage"), col("n_all").as("n")),
            struct(lit("2_lang").as("stage"), col("n_lang").as("n")),
            struct(lit("3_quality").as("stage"), col("n_quality").as("n")),
            struct(lit("4_repetition").as("stage"), col("n_clean").as("n")),
            struct(lit("5_dedup").as("stage"), col("n_final").as("n")))))
        .select(col("col.stage").as("stage"), col("col.n").as("n"))
    }),

    // Per-stratum quota cap: at most 20 docs per source, chosen by
    // deterministic hash order (the absolute per-domain contribution
    // bound rate-based sampling can't give); rank-filter compiles to a
    // WindowGroupLimit partial top-k (PlanSpec).
    "d15_quota_sample" -> ((s, d) =>
      Sampling.quotaSample(
        t(s, d, "documents").select(col("doc_id"), col("source")),
        col("source"), col("doc_id"), quota = 20)),

    // Sub-document segment dedup: non-overlapping 8-token segments,
    // global first-occurrence wins; per-doc duplicate-segment fraction
    // (the C4-style boilerplate pass doc-level dedup misses).
    "d14_segment_dedup" -> ((s, d) =>
      Dedup.segmentDedup(t(s, d, "documents"), col("doc_id"), col("text"),
        segLen = 8)),

    // Concat-then-chunk sequence packing at a 256-token budget via the
    // two-phase distributed prefix sum (no unpartitioned window).
    "p01_seq_pack" -> ((s, d) =>
      Packing.packSequences(t(s, d, "documents"), col("doc_id"),
        Text.tokenCount(col("text")), budget = 256)),

    // Deterministic sharded corpus shuffle (seed-keyed portable hash →
    // shard + intra-shard position; reproducible training order).
    "p02_corpus_shuffle" -> ((s, d) =>
      Packing.shuffleShards(t(s, d, "documents"), col("doc_id"),
        seed = "42", nShards = 16)),

    // Embedding-cosine near-duplicate pairs.
    "e01_cosine_pairs" -> ((s, d) =>
      Ann.cosinePairs(t(s, d, "embeddings"), threshold = 0.4)),

    // Brute-force cosine top-k (exact ANN baseline).
    "e02_ann_brute" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // Metadata-FILTERED ANN (hybrid search, the production retrieval
    // shape: a structured predicate plus a vector query). Candidates
    // are PRE-filtered — the doc-metadata join shrinks the candidate
    // side BEFORE any distance math, the order that preserves recall
    // (post-filtering a top-k can return fewer than k survivors) and
    // at 100 TB turns a corpus-wide scan into a partition-pruned one
    // when the filter column is a partition key.
    "e17_filtered_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val en = emb.join(
          t(s, d, "documents").filter(col("lang") === "en")
            .select(col("doc_id")),
          col("vec_id") === col("doc_id"))
        .select(emb.columns.map(col): _*)
      Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), en, k = 5)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // Metadata-filtered ANN on the IVF path — e17's hybrid search
    // re-shaped for 100 TB: the lang='en' predicate gates candidates
    // INSIDE the probed cells (after nprobe cell selection, before
    // exact scoring), so the filter never re-inflates the candidate
    // set to a corpus scan. Trained cells (the shared e13 codebook);
    // output is recall@3 of the filtered-IVF retrieval against the
    // filtered-exact truth — the measurement that prices the probe
    // cut directly.
    "e18_ivf_filtered_ann" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val keep = t(s, d, "documents").filter(col("lang") === "en")
        .select(col("doc_id"))
      val cents = codebook(s, d)
        .select(col("cluster").as("cent_id"), col("c").as("ce"))
      val probes = emb.filter(col("vec_id") < 10)
      val en = emb.join(keep, col("vec_id") === col("doc_id"))
        .select(emb.columns.map(col): _*)
      Ann.recallAtK(
        Ann.bruteForceTopK(probes, en, k = 3),
        Ann.ivfFilteredTopKWith(cents, probes, emb, keep, k = 3, nprobe = 2))
    }),

    // LSH-bucketed ANN (the scale path).
    "e03_ann_lsh" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.lshTopK(emb.filter(col("vec_id") < 10), emb, nBits = 4, k = 3)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF-bucketed ANN (centroid cells, nprobe=1).
    "e04_ann_ivf" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.ivfTopK(emb.filter(col("vec_id") < 10), emb, nList = 8, k = 3)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF with nprobe=2: each probe searches its two nearest cells —
    // the recall knob a production IVF deployment actually turns
    // (nprobe=1 misses neighbors that assigned just across a cell
    // boundary). Candidates stay single-cell; only the probe side
    // fans out.
    "e06_ann_ivf_nprobe" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      Ann.ivfTopK(emb.filter(col("vec_id") < 10), emb, nList = 8, k = 3,
        nprobe = 2).withColumn("rank", col("rank").cast("long"))
    }),

    // Recall@3 of the LSH index against brute-force truth — the
    // index-quality measurement a real ANN deployment gates on before
    // serving (and re-runs when tuning nBits). Composes the e02 truth
    // and e03 retrieval paths through one tiny equi-join.
    "e07_lsh_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val probes = emb.filter(col("vec_id") < 10)
      Ann.recallAtK(
        Ann.bruteForceTopK(probes, emb, k = 3),
        Ann.lshTopK(probes, emb, nBits = 4, k = 3))
    }),

    // Per-label centroid cosine (SemDeDup-style cluster-typicality
    // score: prune prototypes at the top, outliers at the bottom).
    "e08_centroid_outlier" -> ((s, d) =>
      Ann.centroidOutlier(t(s, d, "embeddings"))),

    // Lloyd's k-means (k=4, two assignment passes): the codebook
    // trainer behind IVF cells and cluster-balanced corpus mixing —
    // broadcast centroids, one codegen'd dot-product pass per
    // iteration, refit shuffles k×dim rows only.
    "e09_kmeans" -> ((s, d) =>
      Ann.assignWith(t(s, d, "embeddings"), codebook(s, d))),

    // SemDeDup: semantic near-dup pairs found WITHIN k-means clusters
    // — the cluster-then-compare pipeline that bounds the quadratic
    // step by cluster size (k grows with the corpus at scale).
    "e10_semdedup" -> ((s, d) =>
      Ann.semDedupPairsWith(t(s, d, "embeddings"), codebook(s, d),
        threshold = 0.4)),

    // Product-quantization codes (m=8 subspaces, 16 codewords each):
    // the billion-scale ANN compression — corpus explodes to subvector
    // rows, equi-joins the broadcast codebook, argmin per (vec, sub).
    "e11_pq_codes" -> ((s, d) =>
      Ann.pqCodes(t(s, d, "embeddings"), m = 8, k = 16)),

    // MinHash index quality: signature-agreement Jaccard estimate vs
    // exact shingle Jaccard per LSH candidate pair — the measurement
    // that validates k/r settings before a production dedup run. Both
    // sides read the shared persisted signature set: no corpus rescan.
    "d16_minhash_quality" -> ((s, d) =>
      Dedup.minHashQualityFromCandidates(sigs(s, d), k = MinHashK,
        cands(s, d), shSizes(s, d))),

    // Multi-signal dedup audit: the MinHash-LSH and SimHash candidate
    // sets full-outer joined (which signal fired per pair) with the
    // exact Jaccard truth per pair — the agreement matrix used to
    // tune band/Hamming thresholds before trusting either signal on
    // a new corpus. Everything stays candidate-gated equi-joins.
    "d18_signal_agreement" -> ((s, d) => {
      val sg = sigs(s, d)
      val lsh = cands(s, d)
        .select(col("doc_a"), col("doc_b")).withColumn("mh", lit(1L))
      val sim = Dedup.simHashPairs(sg.simhash, maxHamming = SimHamming)
        .select(col("doc_a"), col("doc_b")).withColumn("sh", lit(1L))
      // pairs feeds BOTH sides of the final join AND the verify's
      // two internal references — materialize once (bounded at
      // |candidates| + |simhash pairs| rows) instead of re-running
      // the full-outer candidate join four times in one plan. A
      // PARQUET spill, not localCheckpoint: checkpoint blocks are
      // unreplicated executor memory/disk, so on a real cluster one
      // executor loss makes the whole gate unrecoverable (lineage is
      // truncated); the spill re-reads from storage like every other
      // multi-referenced artifact here (r21 verdict item 6).
      val pairs = winSpill(s, d, "d18pairs")(
        lsh.join(sim, Seq("doc_a", "doc_b"), "full_outer")
          .select(col("doc_a"), col("doc_b"),
            coalesce(col("mh"), lit(0L)).as("minhash_hit"),
            coalesce(col("sh"), lit(0L)).as("simhash_hit")))
      pairs.join(Dedup.jaccardForShingles(sg.shingles, pairs, shSizes(s, d)),
          Seq("doc_a", "doc_b"))
        .select(col("doc_a"), col("doc_b"), col("minhash_hit"),
          col("simhash_hit"), col("jaccard"))
    }),

    // Incremental ingest-batch dedup against the PERSISTED band index:
    // the corpus partition's LSH bands live in a durable parquet index
    // (written once, read at every search); the incoming batch (a
    // 1-in-5 hash slice standing in for "today's crawl") computes its
    // own bands and equi-joins the index — per-batch cost scales with
    // the batch, never the corpus, and corpus text is never rescanned.
    "d19_index_dedup" -> ((s, d) => {
      val batchIs = (c: Column) => pmod(Portable.hash64(c), lit(5L)) === 4
      val batchBands = sigs(s, d).bands.filter(batchIs(col("doc")))
      val batchDocs = t(s, d, "documents")
        .filter(batchIs(col("doc_id"))).select(col("doc_id").as("doc"))
      Dedup.indexDedupBatch(s.read.parquet(bandIndexPath(s, d)),
        batchBands, batchDocs)
    }),

    // Fuzzy decontamination: eval-split docs that NEAR-duplicate a
    // train-split doc. d10 catches verbatim shingle overlap; this
    // catches paraphrase-level leakage — band collisions across the
    // d08 hash split, verified by exact Jaccard, all over the shared
    // signature frames (no corpus rescan). The benchmark-hygiene pass
    // run before any eval set is trusted against a trained model.
    "d20_fuzzy_decontam" -> ((s, d) => {
      val sg = sigs(s, d)
      val trainIs = pmod(Portable.hash64(col("doc")), lit(100L)) < 80
      val cand = sg.bands.filter(!trainIs).as("e")
        .join(sg.bands.filter(trainIs).as("tr"),
          col("e.band") === col("tr.band") && col("e.bh") === col("tr.bh"))
        .select(col("e.doc").as("doc_a"), col("tr.doc").as("doc_b"))
        .distinct()
      Dedup.jaccardForShingles(sg.shingles, cand, shSizes(s, d))
        .filter(col("jaccard") >= 0.5)
        .groupBy(col("doc_a").as("eval_doc"))
        .agg(count(lit(1)).as("n_train_dups"),
          max(col("jaccard")).as("max_jaccard"))
    }),

    // IVF over a k-means-TRAINED codebook (the production composition:
    // e09's trainer feeds e04's search; cells follow the data instead
    // of the first-nList stand-ins), searched at nprobe=2 — the recall
    // knob e06 proves, carried into the deployment-shaped query. Same
    // broadcast-assign + cell-equi-join scale shape as e04.
    "e13_ivf_kmeans" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = codebook(s, d)
        .select(col("cluster").as("cent_id"), col("c").as("ce"))
      Ann.ivfTopKWith(cents, emb.filter(col("vec_id") < 10), emb, k = 3,
          nprobe = 2)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF + PQ asymmetric distance — the full billion-scale serving
    // composition: e09's trained cells gate the candidate set
    // (nprobe=2), e11's codes pay the scoring. At scoring time a
    // per-query m·16-entry broadcast distance table replaces every
    // full-precision candidate read (the one-call form also runs the
    // offline encode; see Ann.ivfPqSearchIndexed for the online half).
    "e14_ivf_pq" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = codebook(s, d)
        .select(col("cluster").as("cent_id"), col("c").as("ce"))
      // the 128-row PQ codebook is referenced by BOTH the candidate
      // encode and the per-probe ADC table — pin it driver-local so
      // the codebook subtree runs once, not once per reference
      val cb = Ann.pinTiny(Ann.pqCodebook(Ann.pqSubvectors(emb, 8), 16))
      Ann.ivfPqTopKWith(cents, cb, emb.filter(col("vec_id") < 10), emb,
          m = 8, k = 3, nprobe = 2)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // e14 with the last stand-in removed: the PQ codewords are TRAINED
    // (one Lloyd refit per subspace, all m trainings sharing one
    // corpus pass) just as e13 trained the coarse cells — the fully
    // deployment-shaped serving composition: trained cells, trained
    // codewords, broadcast ADC scoring.
    "e15_ivf_pq_trained" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val cents = codebook(s, d)
        .select(col("cluster").as("cent_id"), col("c").as("ce"))
      // the trained codebook is a whole Lloyd-refit SUBTREE; as a lazy
      // plan it re-ran once per reference (encode + ADC) — pin the
      // 128-row result driver-local so training runs exactly once
      val cb = Ann.pinTiny(
        Ann.pqTrainCodebook(Ann.pqSubvectors(emb, 8), k = 16))
      Ann.ivfPqTopKWith(cents, cb, emb.filter(col("vec_id") < 10), emb,
          m = 8, k = 3, nprobe = 2)
        .withColumn("rank", col("rank").cast("long"))
    }),

    // IVF cell-balance audit over the trained codebook: per-cell
    // occupancy, corpus share, and the balance-vs-uniform ratio —
    // empty cells included (wasted probes), hot cells exposed (the
    // skew bound of every search that probes them). The capacity-
    // planning read on the e13/e14 index before serving traffic.
    "e16_ivf_balance" -> ((s, d) =>
      Ann.ivfCellStats(
        codebook(s, d).select(col("cluster").as("cent_id"), col("c").as("ce")),
        t(s, d, "embeddings"))),

    // Recall cost of int8 quantization: brute-force top-5 over the
    // QUANTIZED vectors scored against the float-precision truth —
    // the "does 4× compression hurt retrieval" measurement run before
    // serving a quantized index (int8 values cast to float exactly,
    // so the whole path reuses the e02/e07 machinery).
    "e12_quantized_recall" -> ((s, d) => {
      val emb = t(s, d, "embeddings")
      val qemb = Ann.quantizeInt8(emb).select(col("vec_id"),
        transform(col("qvec"), _.cast("float")).as("embedding"))
      Ann.recallAtK(
        Ann.bruteForceTopK(emb.filter(col("vec_id") < 10), emb, k = 5),
        Ann.bruteForceTopK(qemb.filter(col("vec_id") < 10), qemb, k = 5))
    }),

    // Int8 embedding quantization (storage/serving compression). The
    // gate projects qvec as a csv string — the comparison harness can't
    // sort array cells; the array-typed operator output is unchanged.
    "e05_quantize" -> ((s, d) =>
      Ann.quantizeInt8(t(s, d, "embeddings"))
        .select(col("vec_id"), col("scale"),
          array_join(transform(col("qvec"), _.cast("string")), ",")
            .as("qvec_csv"))),

    // Corpus vocabulary: top tokens by frequency — the vocab-building
    // scan of a tokenizer-training pipeline. groupBy(token) keeps the
    // partial-agg shape; orderBy+limit compiles to a distributed
    // TakeOrdered (per-partition top-k + merge), so the single-
    // partition rank window only ever sees the final 100 rows.
    "t06_vocab" -> ((s, d) => {
      val counts = t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("token"))
        .groupBy(col("token")).agg(count(lit(1)).as("n"))
      counts.orderBy(col("n").desc, col("token")).limit(100)
        .withColumn("rank", row_number().over(
          Window.orderBy(col("n").desc, col("token"))).cast("long"))
    }),

    // Per-document top-3 TF-IDF terms: the keyword signature for
    // corpus exploration / cluster labeling — keyed partial aggs for
    // tf and df, a broadcast one-row N, per-doc rank window only.
    "t13_tfidf" -> ((s, d) =>
      Text.tfidfTopK(t(s, d, "documents"), col("doc_id"), col("text"), k = 3)),

    // Token-window chunking (the RAG-indexing / long-document prep
    // step): 32-token windows advancing by 24 (8-token overlap); the
    // last chunk always reaches the document end and no chunk is a
    // pure suffix of its predecessor. One narrow projection + per-row
    // generator — zero shuffles (plan-asserted).
    "t17_chunks" -> ((s, d) =>
      Text.chunk(t(s, d, "documents"), col("doc_id"), col("text"),
        window = 32, overlap = 8)),

    // Bigram-LM perplexity scoring — t09's unigram filter with actual
    // context sensitivity: mean −ln P(w|prev) under an add-1-smoothed
    // bigram model fit on the corpus (word salad that fools a unigram
    // filter scores poorly). Per-doc lead window, keyed pair aggs,
    // one-row vocab broadcast.
    "t15_bigram_logprob" -> ((s, d) =>
      Text.bigramLogProb(t(s, d, "documents"), col("doc_id"), col("text"))),

    // Gopher-style hard quality gate: the five accept/reject rules,
    // each reported per document (plus n_fail and the overall pass) so
    // threshold tuning on a new corpus can audit WHICH rule fires.
    // One narrow codegen'd projection over the corpus scan.
    "t16_gopher_rules" -> ((s, d) =>
      Text.gopherRules(t(s, d, "documents"), col("doc_id"), col("text"))),

    // The composed quality funnel: langid → Gopher gate → repetition
    // filter with cumulative survivor counts, fused into ONE corpus
    // scan (every stage a column expression; repetition per-row via
    // sorted-run fold + array_distinct — no joins, no keyed shuffles).
    "t18_quality_funnel" -> ((s, d) =>
      Text.qualityFunnel(t(s, d, "documents"), col("doc_id"), col("text"))),

    // PII scrub: emails/IPv4s/long digit runs detected and masked.
    // The corpus carries no guaranteed PII, so a deterministic PII
    // tail derived from doc_id is appended (both engines build the
    // identical input), making every pattern fire on every row and
    // the masked output byte-comparable.
    "t20_pii_scrub" -> ((s, d) => {
      val withPii = t(s, d, "documents").select(col("doc_id"),
        concat(col("text"),
          lit(" contact user"), col("doc_id"), lit("@example.com from "),
          lit("10.0."), pmod(col("doc_id"), lit(256L)), lit(".1 ref "),
          lit("99999999"), col("doc_id")).as("text"))
      Text.piiScrub(withPii, col("doc_id"), col("text"))
    }),

    // Per-source vocabulary drift: KL of each source's token mix vs
    // the corpus head — the snapshot monitoring read that catches a
    // source gone bad (template spam, language shift) between crawls.
    "t21_source_drift" -> ((s, d) =>
      Text.sourceDrift(t(s, d, "documents"), col("source"), col("text"))),

    // Unicode canonicalization (UAX #15 NFC) over the corpus — the
    // pre-dedup pass that makes composed and decomposed encodings of
    // the same text hash identically. The gate appends a DECOMPOSED
    // tail (e+U+0301, a+U+030A) to each document's prefix, so both
    // engines must compose it (→ é, å: 2 chars shorter) on top of
    // normalizing the corpus text itself. Runs as a native codegen'd
    // Expression (graft.functions.UnicodeNormalize) — one static
    // Normalizer call inside WholeStageCodegen, no UDF boxing.
    "t22_nfc_normalize" -> ((s, d) => {
      val raw = concat(substring(col("text"), 1, 12), lit("e\u0301a\u030A"))
      t(s, d, "documents").select(
        col("doc_id"),
        graft.functions.TextExpressions.nfc(raw).as("norm"),
        length(graft.functions.TextExpressions.nfc(raw)).cast("long").as("n_norm"),
        (length(raw) - length(graft.functions.TextExpressions.nfc(raw)))
          .cast("long").as("n_composed"))
    }),

    // Exact BM25 top-k for a literal keyword query — the lexical
    // retrieval half of a hybrid search stack, and the scorer behind
    // keyword-driven corpus curation ("pull the k docs most about X").
    // The only corpus pass is tokenize → explode → filter-to-query-
    // terms (the predicate lands BEFORE aggregation, so the groupBy
    // runs over |q|-term postings, never the full posting list);
    // N/avgdl cross in as a broadcast 1-row frame, df as |q| broadcast
    // rows, and the top-k is orderBy+limit (TakeOrderedAndProject) —
    // no global sort at any scale.
    "t23_bm25_topk" -> ((s, d) =>
      Text.bm25TopK(t(s, d, "documents"),
        Seq("vector", "customer", "merge", "scan"), k = 10)),

    // The same query SERVED FROM A DURABLE INVERTED INDEX — d19's
    // build-once/serve-many separation for the lexical path. The
    // corpus is tokenized ONCE into postings (hive-partitioned by
    // term-hash bucket), doc lengths, and the 1-row stats; the query
    // plan then reads ONLY index files — the term-bucket predicate
    // prunes partitions (unvisited buckets' directories never open),
    // the term set pushes into the visited buckets' scans, and the
    // corpus text column ships nowhere. Result is bit-identical to
    // t23 (same oracle SQL), which is the point: the index changes
    // the COST of the query, not its answer.
    "t25_bm25_index_serve" -> ((s, d) =>
      Text.bm25TopKFromIndex(s, lexIndexPath(s, d),
        Seq("vector", "customer", "merge", "scan"), k = 10)),

    // Multi-query BM25 in ONE postings scan — the curation-batch
    // shape (hundreds of keyword queries over one corpus): the union
    // of the term sets prunes one bucket-partitioned read, df is a
    // count-over-window on the filtered postings, the (query, term)
    // table broadcasts, and each query's rows equal an independent
    // t23/t25 run bit for bit.
    "t26_bm25_multi" -> ((s, d) =>
      Text.bm25TopKFromIndexMulti(s, lexIndexPath(s, d), Seq(
        "qA" -> Seq("vector", "customer", "merge", "scan"),
        "qB" -> Seq("table", "stream", "window", "sort"),
        "qC" -> Seq("join", "hash", "fast", "slow")), k = 10)),

    // HyperLogLog distinct-shingle cardinality per source + a merged
    // global row ('*') — the third sketch next to t11's count-min and
    // d17's Bloom filter, and the sizing read before an LSH/dedup
    // index build ("how many distinct shingles will this index
    // hold?"). The register table is ≤ |sources|·256 rows whatever
    // the corpus size, built map-side in one pass; the global row is
    // the MERGE of the per-source tables (groupBy-max over registers
    // — the property that lets 1000 executors sketch independently
    // and combine for free). n_exact (the expensive distinct the
    // sketch replaces) rides along as the accuracy truth; err_pct is
    // the measured estimate error, sitting inside the ±6.5% standard
    // error of m=256.
    "t24_hll_distinct" -> ((s, d) => {
      // referenced three times below (register build + both exact
      // branches) — spill once so the corpus tokenize+shingle pass
      // runs once, not per reference
      val sh = winSpill(s, d, "t24sh")(t(s, d, "documents")
        .select(col("source"), Text.tokens(col("text")).as("w"))
        .select(col("source"), explode(Text.shinglesOf(col("w"))).as("sh")))
      val perSrc = Sketch.hllRegisters(sh, col("sh"), Seq(col("source")))
      val merged = perSrc.groupBy(col("reg"))
        .agg(max(col("mj")).as("mj")).withColumn("source", lit("*"))
      val est = Sketch.hllEstimate(
        perSrc.unionByName(merged), Seq("source"))
      val exact = sh.select(col("source"), col("sh"))
        .unionByName(sh.select(lit("*").as("source"), col("sh")))
        .groupBy(col("source"))
        .agg(count_distinct(col("sh")).as("n_exact"))
      exact.join(est, Seq("source"))
        .select(col("source"), col("n_exact"), col("n_regs"), col("hll_est"),
          round(lit(100) * (col("hll_est") - col("n_exact")) / col("n_exact"), 2)
            .as("err_pct"))
        .orderBy(col("source"))
    }),

    // Embedding-health pre-flight (t14's counterpart for the vector
    // corpus): NaN detection, zero vectors, and the norm envelope
    // (min / lower-median / max) — the audit run before pointing any
    // ANN build or cosine math at a new embedding snapshot, where a
    // NaN silently poisons every distance it touches. All scan
    // aggregates plus one partial-top-k window for the exact median;
    // the final combine crosses 1-row frames.
    "e19_embedding_health" -> ((s, d) => {
      val v = t(s, d, "embeddings")
        .select(col("vec_id"), Ann.toDouble(col("embedding")).as("v"))
      val f = v.select(col("vec_id"),
        exists(col("v"), x => isnan(x)).as("has_nan"),
        round(Ann.norm(col("v")), 6).as("nr"))
      // ALL scalar facts in ONE corpus pass (conditional aggregates —
      // a per-fact frame would replicate the embedding scan); the
      // 1-row result is embedded as a LITERAL row so its two
      // consumers below neither re-derive it nor pin a checkpoint
      // block past the gate (the nothing-outlives-the-gate contract —
      // same reasoning as t21's head).
      val statsAgg = f.agg(
        count(lit(1)).as("n_vectors"),
        sum(when(col("has_nan"), 1L).otherwise(0L)).as("n_nan"),
        sum(when(!col("has_nan") && col("nr") === 0.0, 1L).otherwise(0L))
          .as("n_zero"),
        round(min(when(!col("has_nan"), col("nr"))), 6).as("min_norm"),
        round(max(when(!col("has_nan"), col("nr"))), 6).as("max_norm"),
        sum(when(!col("has_nan"), 1L).otherwise(0L)).as("nc"))
      val stats = {
        import scala.jdk.CollectionConverters._
        s.createDataFrame(statsAgg.collect().toList.asJava, statsAgg.schema)
      }
      // Exact lower median WITHOUT a corpus-sized global sort — the
      // audit's second (and last) corpus pass, as distributed
      // counting-selection: (1) collapse to per-DISTINCT-rounded-norm
      // counts (partial-agg groupBy — the only operator that touches
      // corpus rows); (2) range-bucket the distinct values by the
      // min/max literals already in `stats`; (3) per-bucket totals
      // (<= P rows) pick the bucket containing global rank
      // m = ⌈(nc+1)/2⌉ and its preceding-count offset; (4) a
      // cumulative count ordered by nr INSIDE that one bucket finds
      // the smallest value whose global cumulative reaches m. The two
      // empty-partition windows run over <= P bucket rows and over
      // one bucket's distinct values (bounded by rounding granularity
      // × bucket width, never the corpus) — no single task ever
      // orders corpus-sized data. Aggregating (min over the
      // qualifying values) keeps the output 1-row even when EVERY
      // vector is NaN — the audit must report n_nan, not vanish,
      // exactly when the corpus is fully poisoned (med_norm NULL).
      val P = 32
      val g = f.filter(!col("has_nan")).groupBy(col("nr"))
        .agg(count(lit(1)).as("c"))
        .crossJoin(stats.select(col("min_norm"), col("max_norm"), col("nc")))
        .withColumn("b",
          when(col("max_norm") > col("min_norm"),
            least(lit(P - 1), greatest(lit(0),
              floor((col("nr") - col("min_norm")) /
                (col("max_norm") - col("min_norm")) * P))))
            .otherwise(lit(0)).cast("long"))
        .withColumn("m", floor((col("nc") + 1) / 2).cast("long"))
      val wb = org.apache.spark.sql.expressions.Window.orderBy(col("b"))
      val bsel = g.groupBy(col("b"), col("m")).agg(sum(col("c")).as("bc"))
        .withColumn("cum", sum(col("bc")).over(wb))
        .filter(col("cum") >= col("m"))
        .orderBy(col("b")).limit(1)
        .select(col("b").as("tb"), (col("cum") - col("bc")).as("off"))
      val wn = org.apache.spark.sql.expressions.Window.orderBy(col("nr"))
      val med = g.join(bsel, col("b") === col("tb"))
        .withColumn("cumn", sum(col("c")).over(wn) + col("off"))
        .filter(col("cumn") >= col("m"))
        .agg(round(min(col("nr")), 6).as("med_norm"))
      stats.crossJoin(med)
        .select(col("n_vectors"), col("n_nan"), col("n_zero"),
          col("min_norm"), col("med_norm"), col("max_norm"))
    }),

    // Hybrid retrieval by reciprocal-rank fusion: the t23 lexical
    // BM25 list and an e02-shaped cosine list (query = vec 0's
    // embedding) fused as Σ 1/(60 + rank) over the systems that
    // returned the doc — the standard RRF form, rank-only so the two
    // systems' incomparable scores never need calibration. Both input
    // lists are k-bounded before the full-outer merge, so the fusion
    // itself touches ≤ 2k rows no matter the corpus size; at 100 TB
    // the cost IS the two retrievals, each already scale-shaped
    // (t23's filtered postings, e02's broadcast-probe bounded top-k).
    "e20_hybrid_rrf" -> ((s, d) => {
      val lex = Text.bm25TopK(t(s, d, "documents"),
          Seq("vector", "customer", "merge", "scan"), k = 10)
        .select(col("doc_id"), col("rank").as("lex_rank"))
      val emb = t(s, d, "embeddings")
      val vec = Ann.bruteForceTopK(emb.filter(col("vec_id") === 0), emb, k = 10)
        .select(col("cand_id").as("doc_id"),
          col("rank").cast("long").as("vec_rank"))
      val fused = lex.join(vec, Seq("doc_id"), "full_outer")
        .withColumn("rrf", round(
          coalesce(lit(1.0) / (lit(60) + col("lex_rank")), lit(0.0)) +
            coalesce(lit(1.0) / (lit(60) + col("vec_rank")), lit(0.0)), 6))
      val top = fused.orderBy(col("rrf").desc, col("doc_id")).limit(10)
      top.withColumn("rank", row_number()
          .over(org.apache.spark.sql.expressions.Window
            .orderBy(col("rrf").desc, col("doc_id"))).cast("long"))
        .select(col("doc_id"), col("rank"), col("lex_rank"),
          col("vec_rank"), col("rrf"))
    }),

    // Corpus integrity pre-flight: the referential/shape audit run
    // before spending a training job — row counts, doc↔embedding
    // orphans (anti-joins both ways), empty/whitespace-only texts,
    // duplicate ids. One summary row; every count is a scan aggregate
    // or an anti-join, and the final combine crosses 1-row frames.
    "t14_integrity" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val emb = t(s, d, "embeddings")
      val docIds = docs.select(col("doc_id"))
      val vecIds = emb.select(col("vec_id"))
      val nd = docs.agg(count(lit(1)).as("n_docs"),
        count(when(col("text").isNull ||
          length(trim(col("text"))) === 0, 1)).as("n_empty_text"),
        (count(lit(1)) - countDistinct(col("doc_id"))).as("n_dup_doc_ids"))
      val ne = emb.agg(count(lit(1)).as("n_vecs"),
        (count(lit(1)) - countDistinct(col("vec_id"))).as("n_dup_vec_ids"))
      val od = docIds.join(vecIds, col("doc_id") === col("vec_id"), "left_anti")
        .agg(count(lit(1)).as("n_docs_without_vec"))
      val ov = vecIds.join(docIds, col("vec_id") === col("doc_id"), "left_anti")
        .agg(count(lit(1)).as("n_vecs_without_doc"))
      nd.crossJoin(ne).crossJoin(od).crossJoin(ov)
    }),

    // PII-style redaction: digit runs replaced, per-row redaction
    // count surfaced — a single codegen'd regexp pass over the corpus.
    "t07_redact" -> ((s, d) =>
      t(s, d, "events").select(
        col("event_id"),
        regexp_replace(col("props"), "[0-9]{2,}", "<NUM>").as("redacted"),
        regexp_count(col("props"), lit("[0-9]{2,}")).cast("long").as("n_redacted"))),

    // Gopher-style repetition signals: top-token share, duplicate
    // token fraction, duplicate 2-gram fraction, and the resulting
    // repetitive flag — the boilerplate/spam filter pass of a
    // training-data pipeline.
    "t08_repetition" -> ((s, d) =>
      Text.repetitionStats(t(s, d, "documents"), col("doc_id"), col("text"))),

    // Unigram corpus log-probability score (CCNet-style perplexity
    // filter): mean -ln(corpus frequency) per document — the "too
    // stereotypical vs too noisy" curation axis.
    "t09_logprob" -> ((s, d) =>
      Text.corpusLogProb(t(s, d, "documents"), col("doc_id"), col("text"))),

    // Token-entropy information-density signal (near-zero = degenerate
    // repetition; complements the t08 ratio heuristics).
    "t10_entropy" -> ((s, d) =>
      Text.tokenEntropy(t(s, d, "documents"), col("doc_id"), col("text"))),

    // Length-bucketed batch assignment (power-of-two length bins,
    // fixed-size batches within each bin — the padding-efficiency
    // batching used when sequences are not concat-packed).
    "p03_length_buckets" -> ((s, d) =>
      Packing.lengthBuckets(t(s, d, "documents"), col("doc_id"),
        Text.tokenCount(col("text")), batchSize = 8)),

    // Padding-efficiency audit over p03's batches: per batch the
    // dynamic pad target, real token mass, and the pad-token fraction
    // — the proof (or refutation) that a bucket config is worth its
    // GPU-hours before training starts.
    "p04_padding_audit" -> ((s, d) =>
      Packing.paddingEfficiency(
        Packing.lengthBuckets(t(s, d, "documents"), col("doc_id"),
          Text.tokenCount(col("text")), batchSize = 8))),

    // Character-class profile: letter/digit/space/other fractions and
    // uppercase ratio — the script/charset screen that catches binary
    // junk, ALL-CAPS spam, and digit-dense tables before tokenization.
    // One codegen'd regexp pass per class over a single narrow scan.
    "t12_charclass" -> ((s, d) => {
      val len = length(col("text")).cast("double")
      def classLen(re: String) =
        length(regexp_replace(col("text"), re, "")).cast("double")
      val letters = classLen("[^a-zA-Z]")
      t(s, d, "documents").select(
        col("doc_id"),
        round(letters / len, 6).as("letter_frac"),
        round(classLen("[^0-9]") / len, 6).as("digit_frac"),
        round(classLen("[^ ]") / len, 6).as("space_frac"),
        round((len - letters - classLen("[^0-9]") - classLen("[^ ]")) / len, 6)
          .as("other_frac"),
        when(letters > 0, round(classLen("[^A-Z]") / letters, 6))
          .otherwise(lit(0.0)).as("upper_frac"))
    }),

    // Count-min sketch frequency estimation: d×w cells replace the
    // exact vocabulary table; estimates for the top-50 tokens sit
    // next to the truth (CMS never undercounts — the gap IS the
    // collision overcount). Mergeable across partitions/days.
    "t11_cms_freq" -> ((s, d) => {
      // referenced twice (sketch build + exact truth) — spill once so
      // the corpus tokenize pass runs once, not per reference
      val tok = winSpill(s, d, "t11tok")(t(s, d, "documents")
        .select(explode(Text.tokens(col("text"))).as("t")))
      val sketch = Sketch.countMinBuild(tok, col("t"), d = CmsD, w = CmsW)
      val top = tok.groupBy(col("t")).agg(count(lit(1)).as("true_n"))
        .orderBy(col("true_n").desc, col("t")).limit(50)
      Sketch.countMinQuery(sketch, top.select(col("t")), col("t"), CmsD, CmsW)
        .join(top, col("v") === col("t"))
        .select(col("t").as("token"), col("true_n"), col("cms_n"))
    }),

    // Bloom-filter contamination pre-filter: train-split shingles set
    // an m-bit filter; every eval-split shingle probes it. Per eval
    // doc: probed-positive count vs exact-membership count — the
    // sublinear pre-screen that gates the exact d10 join at 100 TB
    // (bloom_hits ≥ exact_hits; the gap is the false-positive cost).
    "d17_bloom_prefilter" -> ((s, d) => {
      val sh = t(s, d, "documents")
        .select(col("doc_id"), Text.tokens(col("text")).as("w"))
        .select(col("doc_id"), explode(Text.shingleSetOf(col("w"))).as("s"))
        .withColumn("b", pmod(Portable.hash64(col("doc_id")), lit(100L)))
      val trainSh = sh.filter(col("b") < 80).select(col("s"))
      val evalSh = sh.filter(col("b") >= 80 && col("b") < 90)
        .select(col("doc_id").as("eval_doc"), col("s"))
      val bloom = Sketch.bloomBuild(trainSh, col("s"), k = BloomK, m = BloomM)
      val pos = Sketch.bloomProbe(bloom, evalSh.select(col("s")).distinct(),
        col("s"), k = BloomK, m = BloomM)
      val exact = trainSh.distinct().withColumn("in_train", lit(1L))
      evalSh
        .join(pos, evalSh("s") === pos("v"))
        .join(exact, Seq("s"), "left")
        .groupBy(col("eval_doc"))
        .agg(count(lit(1)).as("n_shingles"),
          sum(when(col("bloom_positive"), 1L).otherwise(0L)).as("n_bloom"),
          count(col("in_train")).as("n_exact"))
    }),

    // Language ID by marker-token profile.
    "t01_langid" -> ((s, d) => {
      val scores = Text.langScores(col("text"))
      val scoreCols = scores.map { case (l, c) => c.cast("long").as(s"s_$l") }
      val langs = scores.map(_._1)
      val best = langs.init.zipWithIndex.foldRight(lit(langs.last)) {
        case ((l, i), elseCol) =>
          val ge = langs.drop(i + 1)
            .map(o => col(s"s_$l") >= col(s"s_$o")).reduce(_ && _)
          when(ge, lit(l)).otherwise(elseCol)
      }
      t(s, d, "documents")
        .select(col("doc_id") +: col("lang").as("lang_true") +: scoreCols: _*)
        .withColumn("predicted", best)
    }),

    // Quality scoring features.
    "t02_quality" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.meanTokenLen(col("text")).as("mean_token_len"),
        Text.stopwordRatio(col("text")).as("stopword_ratio"),
        Text.nonAlphaRatio(col("text")).as("nonalpha_ratio"),
        Text.qualityScore(col("text")).as("quality"))),

    // Token counting (whitespace + subword-ish).
    "t03_token_stats" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"),
        Text.tokenCount(col("text")).cast("long").as("n_tokens"),
        Text.subwordCount(col("text")).cast("long").as("n_subwords"),
        size(array_distinct(Text.tokens(col("text")))).cast("long").as("n_distinct"))),

    // Position-weighted document fingerprint.
    "t04_fingerprint" -> ((s, d) =>
      t(s, d, "documents").select(
        col("doc_id"), Text.fingerprint(col("text")).as("fp"))),

    // Corpus length profile: exact interpolated quantiles of document
    // length per language (percentile sorts within each group — the
    // per-group distribution shape used to spot truncation/outliers).
    "t05_length_quantiles" -> ((s, d) =>
      t(s, d, "documents")
        .groupBy(col("lang"))
        .agg(
          count(lit(1)).as("n"),
          min(length(col("text"))).cast("long").as("min_len"),
          expr("percentile(length(text), 0.5)").as("p50"),
          expr("percentile(length(text), 0.9)").as("p90"),
          max(length(col("text"))).cast("long").as("max_len"))),

    // Multimodal: batched (mapPartitions) stub decode over binary payloads.
    "m01_media_decode" -> ((s, d) => Multimodal.decodeDocumentsAsMedia(s, d)),

    // Multimodal: frame sampling (flatMap plumbing).
    "m02_frame_sample" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "utf-8").as("payload"),
          lit("video").as("media_type"))
        .as[Multimodal.MediaRecord]
      Multimodal.sampleFrames(media, 4).toDF()
    }),

    // Multimodal: aspect-preserving resize metadata (integer math).
    "m03_resize" -> ((s, d) =>
      Multimodal.resizeMeta(Multimodal.decodeDocumentsAsMedia(s, d), box = 256)
        .select(col("media_id"), col("width"), col("height"),
          col("out_width"), col("out_height"))),

    // Multimodal: batched feature extraction (mapPartitions model stub).
    "m04_features" -> ((s, d) => {
      import s.implicits._
      val media = t(s, d, "documents")
        .select(col("doc_id").as("media_id"),
          encode(col("text"), "utf-8").as("payload"),
          lit("image").as("media_type"))
        .as[Multimodal.MediaRecord]
      Multimodal.extractFeatures(media).toDF()
    }))

  // ---------------------------------------------------------------
  // Oracle SQL (DuckDB dialect). Shared fragments keep the arithmetic
  // in lock-step with the Spark expressions above.
  // ---------------------------------------------------------------

  private def h(expr: String) = Portable.hash64Sql(expr)

  /** Shared by t23 (corpus-scan plan) and t25 (index-served plan):
    * two plans, one truth. */
  private val bm25OracleSql =
    """WITH tok AS (SELECT doc_id,
      |list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
      |FROM documents),
      |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM tok),
      |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, AVG(dl) AS avgdl
      |FROM dl),
      |p AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
      |FROM (SELECT doc_id, unnest(w) AS term FROM tok)
      |WHERE term IN ('vector', 'customer', 'merge', 'scan')
      |GROUP BY doc_id, term),
      |f AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM p
      |GROUP BY term),
      |sc AS (SELECT p.doc_id,
      |round(SUM(ln((st.nd - f.df + 0.5) / (f.df + 0.5) + 1)
      |* p.tf * 2.2
      |/ (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS score
      |FROM p JOIN dl ON p.doc_id = dl.doc_id
      |JOIN f ON p.term = f.term CROSS JOIN st GROUP BY p.doc_id)
      |SELECT doc_id, rank, score FROM (SELECT doc_id, score,
      |ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
      |WHERE rank <= 10""".stripMargin.replace("\n", " ")

  /** tokens CTE fragment: doc + filtered word list. (Shared with the
    * streaming band-dedup oracle, hence package-private.) */
  private[queries] val wordsCte =
    """w AS (SELECT doc_id AS doc, lang,
      |list_filter(string_split(text, ' '), x -> len(x) > 0) AS w, text
      |FROM documents)""".stripMargin.replace("\n", " ")

  /** exploded 3-shingles (with duplicates). */
  private[queries] val shinglesCte =
    """sh AS (SELECT doc, unnest(CASE WHEN len(w) >= 3 THEN
      |list_transform(generate_series(1, len(w) - 2),
      |j -> concat_ws(' ', w[j], w[j+1], w[j+2])) ELSE [] END) AS s FROM w)"""
      .stripMargin.replace("\n", " ")

  private def affine(hExpr: String, iExpr: String) =
    s"MOD($hExpr * (1000003 * ($iExpr + 1) + 12345) + (998244353 * ($iExpr + 1) + 7), ${Portable.MinHashPrime})"

  private[queries] def minhashSigCte(k: Int) =
    s"""hs AS (SELECT doc, s, ${h("s")} AS hv FROM sh),
       |sig AS (SELECT doc, r.range AS i, MIN(${affine("hv", "r.range")}) AS sig
       |FROM hs CROSS JOIN range(0, $k) r GROUP BY doc, r.range)"""
      .stripMargin.replace("\n", " ")

  /** LSH band-hash CTE over `sig` — the [[graft.dedup.Dedup.bandSignatures]]
    * arithmetic in DuckDB. */
  private[queries] def bandsCte(r: Int) =
    s"""bands AS (SELECT doc, i // $r AS band,
       |${h(s"string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
       |FROM sig GROUP BY doc, i // $r)""".stripMargin.replace("\n", " ")

  private val stopIn = Text.Stopwords.map(w => s"x = '$w'").mkString(" OR ")

  private def markerIn(ws: Seq[String]) = ws.map(w => s"x = '$w'").mkString(" OR ")

  /** double[] cast + sequential-fold dot via 1-based index lambda. */
  private def dotSql(a: String, b: String) =
    s"list_reduce(list_transform($a, (x, i) -> x * ($b)[i]), (acc, v) -> acc + v)"

  /** (Shared with the streaming ANN-admission oracle, hence
    * package-private.) */
  private[queries] val vecCte =
    "v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)"

  private val normCte =
    s"n AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nr FROM v)"

  /** One k-means assignment round (needs vecCte + a centroid CTE):
    * rank by the v-independent part of squared L2, rounded to 6 dp,
    * ties to the lower cluster — the exact Ann.kmeans contract. */
  private def kmeansAssignCte(cents: String, out: String) =
    s"""${out}s AS (SELECT v.vec_id, v.e, $cents.cluster,
       |ROW_NUMBER() OVER (PARTITION BY v.vec_id ORDER BY
       |round(${dotSql(s"$cents.c", s"$cents.c")}
       |- 2 * ${dotSql("v.e", s"$cents.c")}, 6), $cents.cluster) AS rn
       |FROM v CROSS JOIN $cents),
       |$out AS (SELECT vec_id, e, cluster FROM ${out}s WHERE rn = 1)"""
      .stripMargin.replace("\n", " ")

  /** k-means (k=4, two assignment passes) unrolled: c0 init →
    * a1 assign → c1 refit (6-dp-rounded per-dim means) → a2 assign. */
  private val kmeansCtes =
    s"""c0 AS (SELECT CAST(vec_id AS INTEGER) AS cluster, e AS c
       |FROM v WHERE vec_id < 4),
       |${kmeansAssignCte("c0", "a1")},
       |m1 AS (SELECT cluster, i, round(AVG(x), 6) AS m FROM (
       |SELECT cluster, unnest(e) AS x, generate_subscripts(e, 1) AS i
       |FROM a1) GROUP BY cluster, i),
       |c1 AS (SELECT cluster, list(m ORDER BY i) AS c FROM m1
       |GROUP BY cluster),
       |${kmeansAssignCte("c1", "a2")}""".stripMargin.replace("\n", " ")

  /** Trained-cell IVF gating CTEs (need vecCte/normCte/kmeansCtes):
    * kc = c1 centroids with norms, sa = cosine scores, casg/pasg =
    * candidate (nearest) / probe (nearest-2) cell assignments —
    * shared by the e13/e14/e15 oracles. */
  private val ivfCellCtes =
    s"""kc AS (SELECT cluster AS cent_id, c AS ce,
       |sqrt(${dotSql("c", "c")}) AS cnr FROM c1),
       |sa AS (SELECT n.vec_id, kc.cent_id,
       |round(${dotSql("n.e", "kc.ce")} / (n.nr * kc.cnr), 6) AS acos
       |FROM n CROSS JOIN kc),
       |casg AS (SELECT vec_id, cent_id FROM (
       |SELECT vec_id, cent_id, ROW_NUMBER() OVER
       |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa)
       |WHERE rn = 1),
       |pasg AS (SELECT vec_id, cent_id FROM (
       |SELECT vec_id, cent_id, ROW_NUMBER() OVER
       |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa)
       |WHERE rn <= 2)""".stripMargin.replace("\n", " ")

  /** m=8 subvector split CTE (needs vecCte). */
  private val pqSpCte =
    """sp AS (SELECT vec_id, r.range AS sub,
      |e[(CAST(r.range AS INTEGER) * (len(e) // 8) + 1):
      |((CAST(r.range AS INTEGER) + 1) * (len(e) // 8))] AS sv
      |FROM v CROSS JOIN range(0, 8) r)""".stripMargin.replace("\n", " ")

  /** The IVF+PQ search tail over a given codebook CTE `cb`: encode
    * (codes), per-query ADC table, cell-gated pairs, in-subspace-order
    * fold, top-3 — identical between e14 and e15 by construction. */
  private def ivfPqSearchSql(cb: String) =
    s"""codes AS (SELECT vec_id AS cand_id, sub, code FROM (
       |SELECT sp.vec_id, sp.sub, $cb.code,
       |ROW_NUMBER() OVER (PARTITION BY sp.vec_id, sp.sub ORDER BY
       |round(${dotSql(s"$cb.cv", s"$cb.cv")}
       |- 2 * ${dotSql("sp.sv", s"$cb.cv")}, 6), $cb.code) AS rn
       |FROM sp JOIN $cb USING (sub)) WHERE rn = 1),
       |adc AS (SELECT q.vec_id AS query_id, q.sub, $cb.code,
       |round(${dotSql("q.sv", s"$cb.cv")}, 6) AS part
       |FROM sp q JOIN $cb USING (sub) WHERE q.vec_id < 10),
       |pairs AS (SELECT p.vec_id AS query_id, p.cent_id,
       |c.vec_id AS cand_id
       |FROM pasg p JOIN casg c ON c.cent_id = p.cent_id
       |WHERE p.vec_id < 10 AND p.vec_id <> c.vec_id),
       |sc AS (SELECT pr.query_id, pr.cent_id, pr.cand_id,
       |round(list_reduce(list(a.part ORDER BY a.sub),
       |(acc, x) -> acc + x), 6) AS adc_dot
       |FROM pairs pr JOIN codes co ON co.cand_id = pr.cand_id
       |JOIN adc a ON a.query_id = pr.query_id AND a.sub = co.sub
       |AND a.code = co.code
       |GROUP BY 1, 2, 3)
       |SELECT query_id, cent_id, cand_id, rank, adc_dot FROM (
       |SELECT query_id, cent_id, cand_id, adc_dot, ROW_NUMBER() OVER
       |(PARTITION BY query_id ORDER BY adc_dot DESC, cand_id) AS rank
       |FROM sc) WHERE rank <= 3""".stripMargin.replace("\n", " ")

  /** d12's weight derivation (per/tot/wtd) — shared with d21, which
    * applies the weights instead of reporting them. */
  private val mixWtdCtes =
    """per AS (SELECT source, COUNT(*) AS n_docs,
      |CAST(SUM(len(list_filter(string_split(text, ' '),
      |x -> len(x) > 0))) AS BIGINT) AS n_tokens
      |FROM documents GROUP BY source),
      |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
      |COUNT(*) AS n_strata FROM per),
      |wtd AS (SELECT source, n_docs, n_tokens,
      |round(CAST(n_tokens AS DOUBLE) / CAST(total_tokens AS DOUBLE), 6)
      |AS token_frac,
      |round(CAST(total_tokens AS DOUBLE)
      |/ (CAST(n_strata AS DOUBLE) * CAST(NULLIF(n_tokens, 0) AS DOUBLE)), 6)
      |AS mix_weight
      |FROM per CROSS JOIN tot)""".stripMargin.replace("\n", " ")

  private[queries] def lshProjWeight(jExpr: String) =
    s"CAST(MOD($jExpr * 2654435761 + i * 40503, 2001) - 1000 AS DOUBLE)"

  /** 63-bit simhash fingerprint CTE chain (needs wordsCte). */
  private val simhashFpCte =
    s"""tok AS (SELECT doc, unnest(w) AS tok FROM w),
       |th AS (SELECT doc, ${Portable.hash63Sql("tok")} AS hv FROM tok),
       |votes AS (SELECT doc, r.range AS j,
       |SUM(CASE WHEN (hv >> CAST(r.range AS INTEGER)) & 1 = 1 THEN 1 ELSE -1 END) AS vote
       |FROM th CROSS JOIN range(0, 63) r GROUP BY doc, r.range),
       |fp AS (SELECT doc, CAST(SUM(CASE WHEN vote > 0
       |THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS simhash
       |FROM votes GROUP BY doc)""".stripMargin.replace("\n", " ")

  val oracles: Map[String, String] = Map(
    "d01_dedup_exact" ->
      """SELECT md5(text) AS digest, MIN(doc_id) AS keep_id,
        |COUNT(*) AS n_copies FROM documents GROUP BY 1""".stripMargin.replace("\n", " "),

    "d02_minhash_sig" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(8)}
         |SELECT doc, i, sig FROM sig""".stripMargin.replace("\n", " "),

    "d03_lsh_candidates" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows)
         |SELECT a.doc AS doc_a, b.doc AS doc_b, COUNT(*) AS n_bands
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc
         |GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    "d04_jaccard_pairs" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
         |FROM cand c JOIN shd a ON a.doc = c.doc_a
         |JOIN shd b ON b.doc = c.doc_b AND b.s = a.s GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) AS jaccard
         |FROM inter JOIN sizes na ON na.doc = doc_a
         |JOIN sizes nb ON nb.doc = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE) >= 0.5"""
        .stripMargin.replace("\n", " "),

    // d04's candidate CTEs with both containment directions.
    "d28_containment" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
         |FROM cand c JOIN shd a ON a.doc = c.doc_a
         |JOIN shd b ON b.doc = c.doc_b AND b.s = a.s GROUP BY 1, 2)
         |SELECT doc_a, doc_b,
         |round(CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE), 6) AS jaccard,
         |round(CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE), 6) AS containment_a,
         |round(CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE), 6) AS containment_b
         |FROM inter JOIN sizes na ON na.doc = doc_a
         |JOIN sizes nb ON nb.doc = doc_b
         |WHERE round(CAST(inter AS DOUBLE) / CAST(na.n AS DOUBLE), 6) >= 0.8
         |OR round(CAST(inter AS DOUBLE) / CAST(nb.n AS DOUBLE), 6) >= 0.8"""
        .stripMargin.replace("\n", " "),

    // d04's verified pairs joined to sources, direction-normalized.
    "d24_source_dup_matrix" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
         |FROM cand c JOIN shd a ON a.doc = c.doc_a
         |JOIN shd b ON b.doc = c.doc_b AND b.s = a.s GROUP BY 1, 2),
         |jac AS (SELECT doc_a, doc_b FROM inter
         |JOIN sizes na ON na.doc = doc_a JOIN sizes nb ON nb.doc = doc_b
         |WHERE CAST(inter AS DOUBLE) / CAST(na.n + nb.n - inter AS DOUBLE)
         |>= 0.5)
         |SELECT LEAST(sa.source, sb.source) AS source_a,
         |GREATEST(sa.source, sb.source) AS source_b,
         |CAST(COUNT(*) AS BIGINT) AS n_dup_pairs
         |FROM jac JOIN documents sa ON sa.doc_id = jac.doc_a
         |JOIN documents sb ON sb.doc_id = jac.doc_b
         |GROUP BY 1, 2""".stripMargin.replace("\n", " "),

    // DSIR: dense 64-bucket axis on both distributions (an unseen
    // bucket still carries its smoothed mass), ln on IEEE doubles with
    // the identical operand shapes as the Spark side, floored to
    // micro-nats per bucket before the integer per-doc sum.
    "d25_dsir_weights" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |tb AS (SELECT doc, MOD(${h("t")}, 64) AS b, COUNT(*) AS c
         |FROM tok GROUP BY 1, 2),
         |tokt AS (SELECT doc, unnest(w) AS t FROM w
         |JOIN documents ON documents.doc_id = w.doc
         |WHERE documents.source = 'src0'),
         |axis AS (SELECT range AS b FROM range(0, 64)),
         |nt AS (SELECT axis.b, COALESCE(x.n, 0) AS n_t FROM axis
         |LEFT JOIN (SELECT MOD(${h("t")}, 64) AS b, COUNT(*) AS n
         |FROM tokt GROUP BY 1) x USING (b)),
         |nr AS (SELECT axis.b, COALESCE(x.n, 0) AS n_r FROM axis
         |LEFT JOIN (SELECT MOD(${h("t")}, 64) AS b, COUNT(*) AS n
         |FROM tok GROUP BY 1) x USING (b)),
         |tot AS (SELECT (SELECT SUM(n_t) FROM nt) AS t_total,
         |(SELECT SUM(n_r) FROM nr) AS r_total),
         |ratios AS (SELECT nt.b,
         |CAST(FLOOR(ln(
         |(CAST(n_t + 1 AS DOUBLE) * CAST(r_total + 64 AS DOUBLE))
         |/ (CAST(n_r + 1 AS DOUBLE) * CAST(t_total + 64 AS DOUBLE))) * 1e6)
         |AS BIGINT) AS lr
         |FROM nt JOIN nr USING (b) CROSS JOIN tot)
         |SELECT doc AS doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |CAST(SUM(c * lr) AS BIGINT) AS weight_micro
         |FROM tb JOIN ratios USING (b)
         |GROUP BY doc""".stripMargin.replace("\n", " "),

    // Chunking: starts are the multiples of step=24 up to the guarded
    // ceil-div last start; chunk_idx falls out as start // step. List
    // slice is 1-based inclusive-and-clamping in both engines.
    "t17_chunks" ->
      s"""WITH $wordsCte,
         |base AS (SELECT doc, w, CAST(len(w) AS BIGINT) AS n FROM w
         |WHERE len(w) > 0),
         |st AS (SELECT doc, n, w,
         |unnest(generate_series(0, ((GREATEST(0, n - 32) + 23) // 24) * 24, 24))
         |AS start FROM base)
         |SELECT doc AS doc_id, CAST(start // 24 AS BIGINT) AS chunk_idx,
         |CAST(start AS BIGINT) AS start_token,
         |CAST(LEAST(32, n - start) AS BIGINT) AS chunk_tokens,
         |array_to_string(w[start + 1 : start + 32], ' ') AS chunk_text
         |FROM st""".stripMargin.replace("\n", " "),

    "d05_simhash" ->
      s"""WITH $wordsCte, $simhashFpCte
         |SELECT doc, simhash FROM fp""".stripMargin.replace("\n", " "),

    "d06_simhash_pairs" ->
      s"""WITH $wordsCte, $simhashFpCte,
         |bands AS (SELECT doc, simhash, r.range AS band,
         |(simhash >> CAST(r.range * 9 AS INTEGER)) & 511 AS bh
         |FROM fp CROSS JOIN range(0, 7) r)
         |SELECT doc_a, doc_b, hamming FROM (
         |SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
         |CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc)
         |WHERE hamming <= $SimHamming""".stripMargin.replace("\n", " "),

    "d07_dedup_groups" ->
      s"""WITH RECURSIVE $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach(doc, r) AS (
         |SELECT doc_id, doc_id FROM documents
         |UNION
         |SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc)
         |SELECT doc, MIN(r) AS group_id FROM reach GROUP BY doc"""
        .stripMargin.replace("\n", " "),

    "d09_canonical" ->
      s"""WITH RECURSIVE $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach(doc, r) AS (
         |SELECT doc_id, doc_id FROM documents
         |UNION
         |SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc),
         |groups AS (SELECT doc, MIN(r) AS group_id FROM reach GROUP BY doc),
         |joined AS (SELECT g.group_id, g.doc, d.n_chars,
         |COUNT(*) OVER (PARTITION BY g.group_id) AS n_docs,
         |ROW_NUMBER() OVER (PARTITION BY g.group_id
         |ORDER BY d.n_chars DESC, g.doc) AS rn
         |FROM groups g JOIN documents d ON d.doc_id = g.doc)
         |SELECT group_id, doc AS canonical_doc, n_chars AS canonical_chars,
         |n_docs FROM joined WHERE rn = 1""".stripMargin.replace("\n", " "),

    "d10_contamination" ->
      s"""WITH $wordsCte, $shinglesCte,
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |b AS (SELECT doc, s, MOD(${h("doc")}, 100) AS bk FROM shd)
         |SELECT t.doc AS train_doc, e.doc AS eval_doc,
         |COUNT(*) AS shared
         |FROM b t JOIN b e ON t.s = e.s AND t.bk < 80
         |AND e.bk >= 80 AND e.bk < 90
         |GROUP BY 1, 2 HAVING COUNT(*) >= 3""".stripMargin.replace("\n", " "),

    "d08_train_split" ->
      s"""SELECT CASE WHEN MOD(${h("doc_id")}, 100) < 80 THEN 'train'
         |WHEN MOD(${h("doc_id")}, 100) < 90 THEN 'val' ELSE 'test' END AS split,
         |COUNT(*) AS n, MIN(doc_id) AS min_doc
         |FROM documents GROUP BY 1""".stripMargin.replace("\n", " "),

    // Funnel flags mirror the Spark chain exactly: LEFT JOINs keep
    // every doc in stage 1; each stage ANDs one more gate.
    "d13_curation_funnel" -> {
      val qualityExpr =
        s"""round((least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
           |+ (1.0 - CAST(length(regexp_replace(text, '[a-z A-Z]', '', 'g')) AS DOUBLE)
           |/ CAST(length(text) AS DOUBLE))
           |+ (1.0 - abs(CAST(len(list_filter(w, x -> $stopIn)) AS DOUBLE)
           |/ CAST(len(w) AS DOUBLE) - 0.4))) / 3.0, 6)"""
          .stripMargin.replace("\n", " ")
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |tc AS (SELECT doc, t, COUNT(*) AS c FROM tok GROUP BY doc, t),
         |tstats AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |MAX(c) AS top_c FROM tc GROUP BY doc),
         |g2 AS (SELECT doc, unnest(CASE WHEN len(w) >= 2 THEN
         |list_transform(generate_series(1, len(w) - 1),
         |j -> concat_ws(' ', w[j], w[j+1])) ELSE [] END) AS g FROM w),
         |gs AS (SELECT doc, COUNT(*) AS n2, COUNT(DISTINCT g) AS nd2
         |FROM g2 GROUP BY doc),
         |rep AS (SELECT tstats.doc,
         |CASE WHEN round(CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) > 0.2
         |OR coalesce(round(1.0 - CAST(nd2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6), 0.0) > 0.4
         |THEN 1 ELSE 0 END AS repetitive
         |FROM tstats LEFT JOIN gs ON gs.doc = tstats.doc),
         |qual AS (SELECT doc, $qualityExpr AS quality FROM w),
         |keep AS (SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY md5(text)),
         |flags AS (SELECT w.doc AS doc_id,
         |(w.lang = 'en') AS f_lang,
         |(w.lang = 'en' AND q.quality >= 0.5) AS f_quality,
         |(w.lang = 'en' AND q.quality >= 0.5 AND r.repetitive = 0) AS f_rep,
         |(w.lang = 'en' AND q.quality >= 0.5 AND r.repetitive = 0
         |AND k.keep_id IS NOT NULL) AS f_dedup
         |FROM w LEFT JOIN rep r ON r.doc = w.doc
         |LEFT JOIN qual q ON q.doc = w.doc
         |LEFT JOIN keep k ON k.keep_id = w.doc)
         |SELECT '1_all' AS stage, COUNT(*) AS n FROM flags
         |UNION ALL SELECT '2_lang', COUNT(*) FROM flags WHERE f_lang
         |UNION ALL SELECT '3_quality', COUNT(*) FROM flags WHERE f_quality
         |UNION ALL SELECT '4_repetition', COUNT(*) FROM flags WHERE f_rep
         |UNION ALL SELECT '5_dedup', COUNT(*) FROM flags WHERE f_dedup"""
        .stripMargin.replace("\n", " ")
    },

    "d11_stratified_sample" ->
      s"""WITH r AS (SELECT doc_id, source,
         |10 + MOD(${h("source")}, 81) AS rate_pct FROM documents)
         |SELECT doc_id, source, rate_pct FROM r
         |WHERE MOD(${h("source || ':' || CAST(doc_id AS VARCHAR)")}, 100)
         |< rate_pct""".stripMargin.replace("\n", " "),

    "d12_domain_mix" ->
      s"""WITH $mixWtdCtes
         |SELECT source, n_docs, n_tokens, token_frac, mix_weight,
         |LEAST(CAST(ceil(mix_weight) AS BIGINT), 5) AS repeat_factor
         |FROM wtd""".stripMargin.replace("\n", " "),

    // Mixture applied: d12's wtd CTE + per-doc copy count
    // floor(eff) + (hash fraction < eff − floor(eff)), exploded to one
    // row per emitted copy.
    "d21_apply_mixture" ->
      s"""WITH $mixWtdCtes,
         |m AS (SELECT d.doc_id, d.source,
         |LEAST(w.mix_weight, 5.0) AS eff,
         |CAST(MOD(${h("'mix:' || CAST(d.doc_id AS VARCHAR)")}, 1000000)
         |AS DOUBLE) AS hpct
         |FROM documents d JOIN wtd w USING (source)
         |WHERE w.mix_weight IS NOT NULL),
         |c AS (SELECT doc_id, source, CAST(floor(eff) AS BIGINT)
         |+ (CASE WHEN hpct < (eff - floor(eff)) * 1000000.0
         |THEN 1 ELSE 0 END) AS copies FROM m)
         |SELECT doc_id, source, unnest(range(1, copies + 1)) AS copy
         |FROM c WHERE copies > 0""".stripMargin.replace("\n", " "),

    // Rolling 8-token windows per doc (1-based slice j..j+7), hashed;
    // first global occurrence by (doc, pos) via ROW_NUMBER, rn>1 = dup.
    "d23_dup_spans" ->
      s"""WITH $wordsCte,
         |js AS (SELECT doc, w, unnest(generate_series(1, len(w) - 7)) AS j
         |FROM w WHERE len(w) >= 8),
         |win AS (SELECT doc, j - 1 AS pos,
         |${h("array_to_string(w[j:(j+7)], ' ')")} AS hw FROM js),
         |rk AS (SELECT doc, pos, hw, ROW_NUMBER() OVER
         |(PARTITION BY hw ORDER BY doc, pos) AS rn FROM win)
         |SELECT doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |AS n_dup_windows,
         |round(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |/ COUNT(*), 6) AS dup_win_frac
         |FROM rk GROUP BY doc""".stripMargin.replace("\n", " "),

    // d23's window construction, DISTINCT per doc, scored for
    // cross-doc sharing instead of global first-occurrence.
    "t19_window_novelty" ->
      s"""WITH $wordsCte,
         |js AS (SELECT doc, w, unnest(generate_series(1, len(w) - 7)) AS j
         |FROM w WHERE len(w) >= 8),
         |wd AS (SELECT DISTINCT doc, array_to_string(w[j:(j+7)], ' ') AS win
         |FROM js),
         |hw AS (SELECT doc, ${h("win")} AS h FROM wd),
         |dc AS (SELECT h, COUNT(DISTINCT doc) AS nd FROM hw GROUP BY h)
         |SELECT hw.doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_windows,
         |CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS BIGINT)
         |AS n_shared_windows,
         |round(1.0 - CAST(SUM(CASE WHEN nd > 1 THEN 1 ELSE 0 END) AS DOUBLE)
         |/ COUNT(*), 6) AS novelty
         |FROM hw JOIN dc USING (h) GROUP BY hw.doc"""
        .stripMargin.replace("\n", " "),

    // The d07 component construction with the split decided by the
    // group hash: components co-assign by construction.
    "d26_leakage_safe_split" ->
      s"""WITH RECURSIVE $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |edges AS (SELECT doc_a AS a, doc_b AS b FROM cand
         |UNION ALL SELECT doc_b, doc_a FROM cand),
         |reach(doc, r) AS (
         |SELECT doc_id, doc_id FROM documents
         |UNION
         |SELECT e.b, reach.r FROM reach JOIN edges e ON e.a = reach.doc),
         |groups AS (SELECT doc, MIN(r) AS group_id FROM reach GROUP BY doc)
         |SELECT doc, group_id,
         |CASE WHEN MOD(${h("group_id")}, 10) < 8 THEN 'train'
         |WHEN MOD(${h("group_id")}, 10) = 8 THEN 'val'
         |ELSE 'test' END AS split FROM groups"""
        .stripMargin.replace("\n", " "),

    // Temperature mixture (α = ½ via sqrt — IEEE-exact); the Σp^α
    // denominator is a sequential fold over the source-ordered list,
    // matching the Spark side's order-pinned aggregate() fold.
    "d22_temp_mixture" ->
      s"""WITH per AS (SELECT source, COUNT(*) AS n_docs,
         |CAST(SUM(len(list_filter(string_split(text, ' '),
         |x -> len(x) > 0))) AS BIGINT) AS n_tokens
         |FROM documents GROUP BY source),
         |tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS total FROM per),
         |f AS (SELECT source, n_docs, n_tokens,
         |CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE) AS p,
         |sqrt(CAST(n_tokens AS DOUBLE) / CAST(total AS DOUBLE)) AS pa
         |FROM per CROSS JOIN tot),
         |sp AS (SELECT list_reduce(list(pa ORDER BY source),
         |(a, b) -> a + b) AS sum_pa FROM f)
         |SELECT source, n_docs, n_tokens, round(p, 6) AS token_frac,
         |round(pa / sum_pa, 6) AS temp_frac,
         |round((pa / sum_pa) / NULLIF(p, 0), 6) AS sample_weight
         |FROM f CROSS JOIN sp""".stripMargin.replace("\n", " "),

    "d15_quota_sample" ->
      s"""WITH r AS (SELECT doc_id, source,
         |CAST(ROW_NUMBER() OVER (PARTITION BY source
         |ORDER BY ${h("source || ':' || CAST(doc_id AS VARCHAR)")}, doc_id)
         |AS BIGINT) AS q_rank FROM documents)
         |SELECT doc_id, source, q_rank FROM r WHERE q_rank <= 20"""
        .stripMargin.replace("\n", " "),

    "d14_segment_dedup" ->
      """WITH tok AS (SELECT doc_id, list_filter(string_split(text, ' '),
        |x -> len(x) > 0) AS w FROM documents),
        |lst AS (SELECT doc_id, [struct_pack(i := k,
        |g := array_to_string(w[(k*8+1):(k*8+8)], ' '))
        |FOR k IN range(0, CAST(ceil(len(w)/8.0) AS BIGINT))] AS segs
        |FROM tok WHERE len(w) > 0),
        |seg AS (SELECT doc_id, unnest(segs).i AS seg_idx,
        |unnest(segs).g AS seg FROM lst),
        |rk AS (SELECT doc_id, seg_idx, seg, ROW_NUMBER() OVER
        |(PARTITION BY seg ORDER BY doc_id, seg_idx) AS rn FROM seg)
        |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_segments,
        |CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS BIGINT)
        |AS n_dup_segments,
        |round(CAST(SUM(CASE WHEN rn > 1 THEN 1 ELSE 0 END) AS DOUBLE)
        |/ COUNT(*), 6) AS dup_seg_frac
        |FROM rk GROUP BY doc_id""".stripMargin.replace("\n", " "),

    "p01_seq_pack" ->
      """WITH tk AS (SELECT doc_id,
        |CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |AS BIGINT) AS n_tokens FROM documents),
        |c AS (SELECT doc_id, n_tokens, CAST(COALESCE(SUM(n_tokens) OVER
        |(ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
        |0) AS BIGINT) AS tok_start FROM tk)
        |SELECT doc_id, n_tokens, tok_start,
        |tok_start // 256 AS seq_start,
        |tok_start % 256 AS off_start,
        |(tok_start + GREATEST(n_tokens, 1) - 1) // 256 AS seq_end,
        |(tok_start + GREATEST(n_tokens, 1) - 1) // 256
        |- tok_start // 256 + 1 AS n_seqs
        |FROM c""".stripMargin.replace("\n", " "),

    "p02_corpus_shuffle" ->
      s"""WITH k AS (SELECT doc_id,
         |${h("'42:' || CAST(doc_id AS VARCHAR)")} AS skey FROM documents)
         |SELECT doc_id, skey % 16 AS shard,
         |CAST(ROW_NUMBER() OVER (PARTITION BY skey % 16
         |ORDER BY skey, doc_id) AS BIGINT) AS pos
         |FROM k""".stripMargin.replace("\n", " "),

    "e01_cosine_pairs" ->
      s"""WITH $vecCte, $normCte,
         |proj AS (SELECT vec_id, r.range AS j,
         |list_reduce(list_transform(e, (x, i) -> x * ${lshProjWeight("r.range")}),
         |(acc, v) -> acc + v) AS p
         |FROM v CROSS JOIN range(0, 4) r),
         |buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN p > 0
         |THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |FROM proj GROUP BY vec_id),
         |nb AS (SELECT n.vec_id, e, nr, bucket FROM n JOIN buckets USING (vec_id))
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b,
         |round(${dotSql("a.e", "b.e")} / (a.nr * b.nr), 6) AS cos
         |FROM nb a JOIN nb b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
         |WHERE round(${dotSql("a.e", "b.e")} / (a.nr * b.nr), 6) >= 0.4"""
        .stripMargin.replace("\n", " "),

    // k-means unrolled: c0 = init (lowest-k ids), a1 = assign, c1 =
    // refit (per-dim mean rounded to 6 dp), a2 = final assign. The
    // score/rounding contract matches Ann.kmeans exactly.
    "e09_kmeans" ->
      s"""WITH $vecCte, $kmeansCtes
         |SELECT vec_id, cluster FROM a2""".stripMargin.replace("\n", " "),

    // PQ: subvector slices (1-based, len/8 dims each) joined to the
    // first-16-vectors codebook; argmin by the kmeans score contract.
    "e11_pq_codes" ->
      s"""WITH $vecCte,
         |sp AS (SELECT vec_id, r.range AS sub,
         |e[(CAST(r.range AS INTEGER) * (len(e) // 8) + 1):
         |((CAST(r.range AS INTEGER) + 1) * (len(e) // 8))] AS sv
         |FROM v CROSS JOIN range(0, 8) r),
         |cb AS (SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS cv
         |FROM sp WHERE vec_id < 16),
         |sc AS (SELECT sp.vec_id, sp.sub, cb.code,
         |ROW_NUMBER() OVER (PARTITION BY sp.vec_id, sp.sub ORDER BY
         |round(${dotSql("cb.cv", "cb.cv")}
         |- 2 * ${dotSql("sp.sv", "cb.cv")}, 6), cb.code) AS rn
         |FROM sp JOIN cb USING (sub))
         |SELECT vec_id, sub, code FROM sc WHERE rn = 1"""
        .stripMargin.replace("\n", " "),

    "d16_minhash_quality" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |est AS (SELECT doc_a, doc_b,
         |CAST(SUM(CASE WHEN sa.sig = sb.sig THEN 1 ELSE 0 END) AS DOUBLE)
         |/ $MinHashK AS jaccard_est
         |FROM cand c JOIN sig sa ON sa.doc = c.doc_a
         |JOIN sig sb ON sb.doc = c.doc_b AND sb.i = sa.i
         |GROUP BY doc_a, doc_b),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT doc_a, doc_b, COUNT(*) AS inter
         |FROM cand c JOIN shd a ON a.doc = c.doc_a
         |JOIN shd b ON b.doc = c.doc_b AND b.s = a.s GROUP BY 1, 2)
         |SELECT e.doc_a, e.doc_b, e.jaccard_est,
         |COALESCE(CAST(i.inter AS DOUBLE)
         |/ CAST(na.n + nb.n - i.inter AS DOUBLE), 0.0) AS jaccard
         |FROM est e LEFT JOIN inter i ON i.doc_a = e.doc_a AND i.doc_b = e.doc_b
         |LEFT JOIN sizes na ON na.doc = e.doc_a
         |LEFT JOIN sizes nb ON nb.doc = e.doc_b""".stripMargin.replace("\n", " "),

    // Signal agreement: minhash band pairs FULL OUTER JOIN simhash
    // band pairs, exact Jaccard left-joined per union pair (0.0 when
    // no shingle is shared or a doc is too short to shingle).
    "d18_signal_agreement" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)}, $simhashFpCte,
         |bands AS (SELECT doc, i // $LshRows AS band,
         |${h("string_agg(CAST(sig AS VARCHAR), ',' ORDER BY i)")} AS bh
         |FROM sig GROUP BY doc, i // $LshRows),
         |cand AS (SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b
         |FROM bands a JOIN bands b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc),
         |sb AS (SELECT doc, simhash, r.range AS band,
         |(simhash >> CAST(r.range * 9 AS INTEGER)) & 511 AS bh
         |FROM fp CROSS JOIN range(0, 7) r),
         |spair AS (SELECT doc_a, doc_b FROM (
         |SELECT DISTINCT a.doc AS doc_a, b.doc AS doc_b,
         |CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
         |FROM sb a JOIN sb b
         |ON a.band = b.band AND a.bh = b.bh AND a.doc < b.doc)
         |WHERE hamming <= $SimHamming),
         |u AS (SELECT COALESCE(c.doc_a, s.doc_a) AS doc_a,
         |COALESCE(c.doc_b, s.doc_b) AS doc_b,
         |CAST(CASE WHEN c.doc_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |AS minhash_hit,
         |CAST(CASE WHEN s.doc_a IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
         |AS simhash_hit
         |FROM cand c FULL OUTER JOIN spair s
         |ON s.doc_a = c.doc_a AND s.doc_b = c.doc_b),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT u.doc_a, u.doc_b, COUNT(*) AS inter
         |FROM u JOIN shd a ON a.doc = u.doc_a
         |JOIN shd b ON b.doc = u.doc_b AND b.s = a.s GROUP BY 1, 2)
         |SELECT u.doc_a, u.doc_b, u.minhash_hit, u.simhash_hit,
         |COALESCE(CAST(i.inter AS DOUBLE)
         |/ CAST(na.n + nb.n - i.inter AS DOUBLE), 0.0) AS jaccard
         |FROM u LEFT JOIN inter i
         |ON i.doc_a = u.doc_a AND i.doc_b = u.doc_b
         |LEFT JOIN sizes na ON na.doc = u.doc_a
         |LEFT JOIN sizes nb ON nb.doc = u.doc_b"""
        .stripMargin.replace("\n", " "),

    // Incremental index dedup: corpus = hash-bucket < 4 of 5, batch =
    // bucket 4; batch bands join the corpus bands, every batch doc
    // keeps a row (n_dups 0 / first_dup -1 when new to the corpus).
    "d19_index_dedup" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |${bandsCte(LshRows)},
         |corpus AS (SELECT doc AS corpus_doc, band, bh FROM bands
         |WHERE MOD(${h("doc")}, 5) < 4),
         |batch AS (SELECT doc, band, bh FROM bands
         |WHERE MOD(${h("doc")}, 5) = 4),
         |hits AS (SELECT b.doc, COUNT(DISTINCT c.corpus_doc) AS n_dups,
         |MIN(c.corpus_doc) AS first_dup
         |FROM batch b JOIN corpus c ON c.band = b.band AND c.bh = b.bh
         |GROUP BY b.doc)
         |SELECT d.doc_id AS doc, COALESCE(hh.n_dups, 0) AS n_dups,
         |COALESCE(hh.first_dup, -1) AS first_dup
         |FROM documents d LEFT JOIN hits hh ON hh.doc = d.doc_id
         |WHERE MOD(${h("doc_id")}, 5) = 4""".stripMargin.replace("\n", " "),

    // Fuzzy decontam: band collisions across the d08 80/20 hash
    // split, exact-Jaccard verified at 0.5 (the d18 verify CTE shape).
    "d20_fuzzy_decontam" ->
      s"""WITH $wordsCte, $shinglesCte, ${minhashSigCte(MinHashK)},
         |${bandsCte(LshRows)},
         |tr AS (SELECT doc, band, bh FROM bands
         |WHERE MOD(${h("doc")}, 100) < 80),
         |ev AS (SELECT doc, band, bh FROM bands
         |WHERE MOD(${h("doc")}, 100) >= 80),
         |cand AS (SELECT DISTINCT e.doc AS doc_a, t.doc AS doc_b
         |FROM ev e JOIN tr t ON t.band = e.band AND t.bh = e.bh),
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |sizes AS (SELECT doc, COUNT(*) AS n FROM shd GROUP BY doc),
         |inter AS (SELECT c.doc_a, c.doc_b, COUNT(*) AS inter
         |FROM cand c JOIN shd a ON a.doc = c.doc_a
         |JOIN shd b ON b.doc = c.doc_b AND b.s = a.s GROUP BY 1, 2),
         |j AS (SELECT c.doc_a, c.doc_b,
         |COALESCE(CAST(i.inter AS DOUBLE)
         |/ CAST(na.n + nb.n - i.inter AS DOUBLE), 0.0) AS jaccard
         |FROM cand c LEFT JOIN inter i
         |ON i.doc_a = c.doc_a AND i.doc_b = c.doc_b
         |LEFT JOIN sizes na ON na.doc = c.doc_a
         |LEFT JOIN sizes nb ON nb.doc = c.doc_b)
         |SELECT doc_a AS eval_doc, COUNT(*) AS n_train_dups,
         |MAX(jaccard) AS max_jaccard
         |FROM j WHERE jaccard >= 0.5 GROUP BY 1"""
        .stripMargin.replace("\n", " "),

    // SemDeDup = kmeans assignment (a2) + same-cluster cosine pairs.
    "e10_semdedup" ->
      s"""WITH $vecCte, $kmeansCtes,
         |j AS (SELECT a2.vec_id, a2.e, a2.cluster,
         |sqrt(${dotSql("a2.e", "a2.e")}) AS nr FROM a2)
         |SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.cluster AS cluster,
         |round(${dotSql("a.e", "b.e")} / (a.nr * b.nr), 6) AS cos
         |FROM j a JOIN j b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
         |WHERE round(${dotSql("a.e", "b.e")} / (a.nr * b.nr), 6) >= 0.4"""
        .stripMargin.replace("\n", " "),

    "e08_centroid_outlier" ->
      s"""WITH vl AS (SELECT vec_id, label,
         |CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
         |comps AS (SELECT label, i, AVG(x) AS m FROM (
         |SELECT label, unnest(e) AS x, generate_subscripts(e, 1) AS i
         |FROM vl) GROUP BY label, i),
         |cent AS (SELECT label, list(m ORDER BY i) AS c
         |FROM comps GROUP BY label)
         |SELECT vl.vec_id, vl.label,
         |round(${dotSql("vl.e", "cent.c")}
         |/ (sqrt(${dotSql("vl.e", "vl.e")}) * sqrt(${dotSql("cent.c", "cent.c")})),
         |6) AS centroid_cos
         |FROM vl JOIN cent USING (label)"""
        .stripMargin.replace("\n", " "),

    "e02_ann_brute" ->
      s"""WITH $vecCte, $normCte,
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cand_id, rank, cos FROM (
         |SELECT query_id, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin.replace("\n", " "),

    // same ranking as e02, candidates pre-filtered by the doc join
    "e17_filtered_ann" ->
      s"""WITH $vecCte, $normCte,
         |f AS (SELECT n.* FROM n JOIN documents d ON n.vec_id = d.doc_id
         |WHERE d.lang = 'en'),
         |scored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM n q JOIN f c ON q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cand_id, rank, cos FROM (
         |SELECT query_id, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 5""".stripMargin.replace("\n", " "),

    // Filtered-IVF replay: f = the en id set; truth = exact top-3
    // over the filtered corpus (the e17 shape at k=3); retrieval =
    // the e13 trained-cell probe with the candidate side gated by f;
    // recall join as e12.
    "e18_ivf_filtered_ann" ->
      s"""WITH $vecCte, $normCte, $kmeansCtes, $ivfCellCtes,
         |f AS (SELECT n.vec_id FROM n JOIN documents d
         |ON n.vec_id = d.doc_id WHERE d.lang = 'en'),
         |tsc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id
         |JOIN f ON c.vec_id = f.vec_id),
         |truth AS (SELECT query_id, cand_id FROM (
         |SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |ORDER BY cos DESC, cand_id) AS rank FROM tsc) WHERE rank <= 3),
         |nbc AS (SELECT n.vec_id, e, nr, a.cent_id FROM n
         |JOIN casg a USING (vec_id) JOIN f USING (vec_id)),
         |nbp AS (SELECT n.vec_id, e, nr, a.cent_id FROM n
         |JOIN pasg a USING (vec_id)),
         |rsc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nbp q JOIN nbc c ON q.cent_id = c.cent_id
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |retr AS (SELECT query_id, cand_id FROM (
         |SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
         |ORDER BY cos DESC, cand_id) AS rank FROM rsc) WHERE rank <= 3)
         |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_true,
         |CAST(COUNT(r.cand_id) AS BIGINT) AS n_hit,
         |round(CAST(COUNT(r.cand_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM truth t LEFT JOIN retr r
         |ON r.query_id = t.query_id AND r.cand_id = t.cand_id
         |GROUP BY t.query_id""".stripMargin.replace("\n", " "),

    "e03_ann_lsh" ->
      s"""WITH $vecCte, $normCte,
         |proj AS (SELECT vec_id, r.range AS j,
         |list_reduce(list_transform(e, (x, i) -> x * ${lshProjWeight("r.range")}),
         |(acc, v) -> acc + v) AS p
         |FROM v CROSS JOIN range(0, 4) r),
         |buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN p > 0
         |THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |FROM proj GROUP BY vec_id),
         |nb AS (SELECT n.vec_id, e, nr, bucket FROM n JOIN buckets USING (vec_id)),
         |scored AS (SELECT q.vec_id AS query_id, q.bucket AS bucket,
         |c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nb q JOIN nb c ON q.bucket = c.bucket
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, bucket, cand_id, rank, cos FROM (
         |SELECT query_id, bucket, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    "e04_ann_ivf" ->
      s"""WITH $vecCte, $normCte,
         |cents AS (SELECT vec_id AS cent_id, e AS ce, nr AS cnr FROM n WHERE vec_id < 8),
         |sa AS (SELECT n.vec_id, c.cent_id,
         |round(${dotSql("n.e", "c.ce")} / (n.nr * c.cnr), 6) AS acos
         |FROM n CROSS JOIN cents c),
         |asg AS (SELECT vec_id, cent_id FROM (
         |SELECT vec_id, cent_id, ROW_NUMBER() OVER
         |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa) WHERE rn = 1),
         |nb AS (SELECT n.vec_id, e, nr, a.cent_id FROM n JOIN asg a USING (vec_id)),
         |scored AS (SELECT q.vec_id AS query_id, q.cent_id AS cent_id,
         |c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nb q JOIN nb c ON q.cent_id = c.cent_id
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cent_id, cand_id, rank, cos FROM (
         |SELECT query_id, cent_id, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    // Same construction as e04 with the probe assignment widened to
    // rn <= 2 (candidate assignment stays rn = 1, so no candidate is
    // ever counted twice).
    "e06_ann_ivf_nprobe" ->
      s"""WITH $vecCte, $normCte,
         |cents AS (SELECT vec_id AS cent_id, e AS ce, nr AS cnr FROM n WHERE vec_id < 8),
         |sa AS (SELECT n.vec_id, c.cent_id,
         |round(${dotSql("n.e", "c.ce")} / (n.nr * c.cnr), 6) AS acos
         |FROM n CROSS JOIN cents c),
         |casg AS (SELECT vec_id, cent_id FROM (
         |SELECT vec_id, cent_id, ROW_NUMBER() OVER
         |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa) WHERE rn = 1),
         |pasg AS (SELECT vec_id, cent_id FROM (
         |SELECT vec_id, cent_id, ROW_NUMBER() OVER
         |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa) WHERE rn <= 2),
         |nbc AS (SELECT n.vec_id, e, nr, a.cent_id FROM n JOIN casg a USING (vec_id)),
         |nbp AS (SELECT n.vec_id, e, nr, a.cent_id FROM n JOIN pasg a USING (vec_id)),
         |scored AS (SELECT q.vec_id AS query_id, q.cent_id AS cent_id,
         |c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nbp q JOIN nbc c ON q.cent_id = c.cent_id
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cent_id, cand_id, rank, cos FROM (
         |SELECT query_id, cent_id, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    // Truth = the e02 brute-force construction at k=3; retrieved = the
    // e03 LSH construction at k=3; recall = hit fraction per query.
    "e07_lsh_recall" ->
      s"""WITH $vecCte, $normCte,
         |bscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM n q JOIN n c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |truth AS (SELECT query_id, cand_id FROM (
         |SELECT query_id, cand_id, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM bscored)
         |WHERE rank <= 3),
         |proj AS (SELECT vec_id, r.range AS j,
         |list_reduce(list_transform(e, (x, i) -> x * ${lshProjWeight("r.range")}),
         |(acc, v) -> acc + v) AS p
         |FROM v CROSS JOIN range(0, 4) r),
         |buckets AS (SELECT vec_id, CAST(SUM(CASE WHEN p > 0
         |THEN (CAST(1 AS BIGINT) << CAST(j AS INTEGER)) ELSE 0 END) AS BIGINT) AS bucket
         |FROM proj GROUP BY vec_id),
         |nb AS (SELECT n.vec_id, e, nr, bucket FROM n JOIN buckets USING (vec_id)),
         |lscored AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nb q JOIN nb c ON q.bucket = c.bucket
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id),
         |got AS (SELECT query_id, cand_id FROM (
         |SELECT query_id, cand_id, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM lscored)
         |WHERE rank <= 3)
         |SELECT t.query_id, COUNT(*) AS n_true, COUNT(g.cand_id) AS n_hit,
         |round(CAST(COUNT(g.cand_id) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6)
         |AS recall
         |FROM truth t LEFT JOIN got g
         |ON g.query_id = t.query_id AND g.cand_id = t.cand_id
         |GROUP BY t.query_id""".stripMargin.replace("\n", " "),

    // e04's search construction over the e09-trained codebook (c1 =
    // centroids after one refit; cosine assignment like every IVF
    // cell mapping here).
    // IVF+PQ ADC: e13's trained-cell gating (casg/pasg) + e11's code
    // CTEs; the per-query distance table `adc` is summed over the
    // candidate's codes by an in-subspace-order fold (list ORDER BY
    // sub) so the score matches the Spark fold bit-for-bit.
    "e14_ivf_pq" ->
      s"""WITH $vecCte, $normCte, $kmeansCtes, $ivfCellCtes, $pqSpCte,
         |cb AS (SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS cv
         |FROM sp WHERE vec_id < 16),
         |${ivfPqSearchSql("cb")}""".stripMargin.replace("\n", " "),

    // e14 with TRAINED codewords: cb0 (first-16 init) → pqa1 assign →
    // rf per-(sub, code) 6-dp-rounded per-dim means → cb1; codes and
    // the ADC table then reference cb1. Everything else is e14.
    "e15_ivf_pq_trained" ->
      s"""WITH $vecCte, $normCte, $kmeansCtes, $ivfCellCtes, $pqSpCte,
         |cb0 AS (SELECT sub, CAST(vec_id AS INTEGER) AS code, sv AS cv
         |FROM sp WHERE vec_id < 16),
         |pqa1 AS (SELECT vec_id, sub, code, sv FROM (
         |SELECT sp.vec_id, sp.sub, sp.sv, cb0.code,
         |ROW_NUMBER() OVER (PARTITION BY sp.vec_id, sp.sub ORDER BY
         |round(${dotSql("cb0.cv", "cb0.cv")}
         |- 2 * ${dotSql("sp.sv", "cb0.cv")}, 6), cb0.code) AS rn
         |FROM sp JOIN cb0 USING (sub)) WHERE rn = 1),
         |rf AS (SELECT sub, code, i, round(AVG(x), 6) AS m FROM (
         |SELECT sub, code, unnest(sv) AS x, generate_subscripts(sv, 1) AS i
         |FROM pqa1) GROUP BY sub, code, i),
         |cb1 AS (SELECT sub, code, list(m ORDER BY i) AS cv FROM rf
         |GROUP BY sub, code),
         |${ivfPqSearchSql("cb1")}""".stripMargin.replace("\n", " "),

    // IVF cell balance: casg (nearest trained cell per vector) rolled
    // up per cell, LEFT-joined from the centroid relation so empty
    // cells keep a 0 row; all-long until the two divisions.
    "e16_ivf_balance" ->
      s"""WITH $vecCte, $normCte, $kmeansCtes, $ivfCellCtes,
         |cnt AS (SELECT cent_id, COUNT(*) AS n FROM casg GROUP BY cent_id),
         |per AS (SELECT kc.cent_id AS cell,
         |CAST(COALESCE(cnt.n, 0) AS BIGINT) AS n_vectors
         |FROM kc LEFT JOIN cnt ON kc.cent_id = cnt.cent_id),
         |ctot AS (SELECT CAST(SUM(n_vectors) AS BIGINT) AS total,
         |COUNT(*) AS n_cells FROM per)
         |SELECT cell, n_vectors,
         |round(CAST(n_vectors AS DOUBLE) / CAST(total AS DOUBLE), 6)
         |AS cell_frac,
         |round(CAST(n_vectors AS DOUBLE) * CAST(n_cells AS DOUBLE)
         |/ CAST(total AS DOUBLE), 6) AS balance
         |FROM per CROSS JOIN ctot""".stripMargin.replace("\n", " "),

    "e13_ivf_kmeans" ->
      s"""WITH $vecCte, $normCte, $kmeansCtes,
         |kc AS (SELECT cluster AS cent_id, c AS ce,
         |sqrt(${dotSql("c", "c")}) AS cnr FROM c1),
         |sa AS (SELECT n.vec_id, kc.cent_id,
         |round(${dotSql("n.e", "kc.ce")} / (n.nr * kc.cnr), 6) AS acos
         |FROM n CROSS JOIN kc),
         |casg AS (SELECT vec_id, cent_id FROM (
         |SELECT vec_id, cent_id, ROW_NUMBER() OVER
         |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa)
         |WHERE rn = 1),
         |pasg AS (SELECT vec_id, cent_id FROM (
         |SELECT vec_id, cent_id, ROW_NUMBER() OVER
         |(PARTITION BY vec_id ORDER BY acos DESC, cent_id) AS rn FROM sa)
         |WHERE rn <= 2),
         |nbc AS (SELECT n.vec_id, e, nr, a.cent_id FROM n JOIN casg a USING (vec_id)),
         |nbp AS (SELECT n.vec_id, e, nr, a.cent_id FROM n JOIN pasg a USING (vec_id)),
         |scored AS (SELECT q.vec_id AS query_id, q.cent_id AS cent_id,
         |c.vec_id AS cand_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM nbp q JOIN nbc c ON q.cent_id = c.cent_id
         |AND q.vec_id < 10 AND q.vec_id <> c.vec_id)
         |SELECT query_id, cent_id, cand_id, rank, cos FROM (
         |SELECT query_id, cent_id, cand_id, cos, ROW_NUMBER() OVER
         |(PARTITION BY query_id ORDER BY cos DESC, cand_id) AS rank FROM scored)
         |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    // Quantized path: floor(x·scale + ½) ints cast back to double
    // (exact), then the e02 top-5 shape on both representations and
    // the e07 recall join between them.
    "e12_quantized_recall" -> {
      def topkCte(src: String, out: String) =
        s"""${out}sc AS (SELECT q.vec_id AS query_id, c.vec_id AS cand_id,
           |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
           |FROM $src q JOIN $src c ON q.vec_id < 10 AND q.vec_id <> c.vec_id),
           |$out AS (SELECT query_id, cand_id FROM (
           |SELECT query_id, cand_id, ROW_NUMBER() OVER (PARTITION BY query_id
           |ORDER BY cos DESC, cand_id) AS rank FROM ${out}sc) WHERE rank <= 5)"""
          .stripMargin.replace("\n", " ")
      s"""WITH $vecCte, $normCte,
         |m AS (SELECT vec_id, e,
         |list_max(list_transform(e, x -> abs(x))) AS ma FROM v),
         |qv AS (SELECT vec_id, CASE WHEN ma = 0
         |THEN list_transform(e, x -> 0.0)
         |ELSE list_transform(e, x ->
         |CAST(CAST(floor(x * (127.0 / ma) + 0.5) AS INTEGER) AS DOUBLE))
         |END AS e FROM m),
         |qn AS (SELECT vec_id, e, sqrt(${dotSql("e", "e")}) AS nr FROM qv),
         |${topkCte("n", "truth")},
         |${topkCte("qn", "retr")}
         |SELECT t.query_id, CAST(COUNT(*) AS BIGINT) AS n_true,
         |CAST(COUNT(r.cand_id) AS BIGINT) AS n_hit,
         |round(CAST(COUNT(r.cand_id) AS DOUBLE) / COUNT(*), 6) AS recall
         |FROM truth t LEFT JOIN retr r
         |ON r.query_id = t.query_id AND r.cand_id = t.cand_id
         |GROUP BY t.query_id""".stripMargin.replace("\n", " ")
    },

    // Head selection (count desc, token asc) and all probabilities
    // are exact-integer-derived; the only float work is the <=50-term
    // KL sum, rounded to 6 dp like every cross-engine float.
    "t21_source_drift" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |st AS (SELECT d.source, tok.t FROM tok
         |JOIN documents d ON d.doc_id = tok.doc),
         |cnt AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
         |head AS (SELECT t, n AS nw FROM (SELECT t, n,
         |ROW_NUMBER() OVER (ORDER BY n DESC, t) AS rn FROM cnt)
         |WHERE rn <= 50),
         |ht AS (SELECT CAST(SUM(nw) AS BIGINT) AS nh FROM head),
         |sc AS (SELECT source, st.t, COUNT(*) AS ns FROM st
         |JOIN head ON head.t = st.t GROUP BY source, st.t),
         |stot AS (SELECT source, CAST(SUM(ns) AS BIGINT) AS nstot
         |FROM sc GROUP BY source),
         |drift AS (SELECT sc.source, MAX(stot.nstot) AS n_head,
         |round(SUM((CAST(ns AS DOUBLE) / nstot)
         |* ln((CAST(ns AS DOUBLE) / nstot)
         |/ (CAST(nw AS DOUBLE) / nh))), 6) AS kl
         |FROM sc JOIN stot USING (source) JOIN head ON head.t = sc.t
         |CROSS JOIN ht GROUP BY sc.source),
         |srcs AS (SELECT DISTINCT source FROM documents)
         |SELECT srcs.source, CAST(COALESCE(d.n_head, 0) AS BIGINT) AS n_head,
         |d.kl FROM srcs LEFT JOIN drift d
         |ON srcs.source IS NOT DISTINCT FROM d.source"""
        .stripMargin.replace("\n", " "),

    // Both engines implement UAX #15, so NFC outputs are
    // bit-identical; chr(769)/chr(778) are the combining acute/ring
    // the Spark side appends as ́/̊. length() is
    // char-counted in both engines.
    "t22_nfc_normalize" ->
      """WITH r AS (SELECT doc_id,
        |substr(text, 1, 12) || 'e' || chr(769) || 'a' || chr(778) AS raw
        |FROM documents)
        |SELECT doc_id, nfc_normalize(raw) AS norm,
        |CAST(length(nfc_normalize(raw)) AS BIGINT) AS n_norm,
        |CAST(length(raw) - length(nfc_normalize(raw)) AS BIGINT) AS n_composed
        |FROM r""".stripMargin.replace("\n", " "),

    // Embedding-health closed form: the norm is rounded at source so
    // min/median/max aggregate already-rounded values; the median is
    // the exact lower median ((nc+1)//2) over (norm, vec_id) order.
    "e19_embedding_health" ->
      s"""WITH $vecCte,
         |f AS (SELECT vec_id,
         |len(list_filter(e, x -> isnan(x))) > 0 AS has_nan,
         |round(sqrt(${dotSql("e", "e")}), 6) AS nr FROM v),
         |s AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_vectors,
         |CAST(SUM(CASE WHEN has_nan THEN 1 ELSE 0 END) AS BIGINT) AS n_nan,
         |CAST(SUM(CASE WHEN NOT has_nan AND nr = 0 THEN 1 ELSE 0 END)
         |AS BIGINT) AS n_zero,
         |round(MIN(CASE WHEN NOT has_nan THEN nr END), 6) AS min_norm,
         |round(MAX(CASE WHEN NOT has_nan THEN nr END), 6) AS max_norm,
         |CAST(SUM(CASE WHEN NOT has_nan THEN 1 ELSE 0 END) AS BIGINT) AS nc
         |FROM f),
         |r AS (SELECT nr, ROW_NUMBER() OVER (ORDER BY nr ASC, vec_id) AS rn
         |FROM f WHERE NOT has_nan),
         |m AS (SELECT round(MIN(r.nr), 6) AS med_norm FROM r CROSS JOIN s
         |WHERE r.rn = (s.nc + 1) // 2)
         |SELECT n_vectors, n_nan, n_zero, min_norm, med_norm, max_norm
         |FROM s CROSS JOIN m""".stripMargin.replace("\n", " "),

    // BM25 closed form (Lucene idf, k1=1.2 b=0.75): same tokenizer as
    // every t-gate, same left-associative literal arithmetic as the
    // Spark column expression, score rounded to 6 dp before ranking.
    "t23_bm25_topk" -> bm25OracleSql,

    // The index-served path answers the SAME query — one oracle text
    // pins both plans to one truth (the index changes cost, not the
    // answer).
    "t25_bm25_index_serve" -> bm25OracleSql,

    // Multi-query closed form: per query, the SAME arithmetic as the
    // t23/t25 oracle — df/N/avgdl are corpus facts, so scoring three
    // queries from one filtered postings pass changes nothing.
    "t26_bm25_multi" ->
      """WITH tk AS (SELECT doc_id,
        |list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
        |FROM documents),
        |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM tk),
        |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, AVG(dl) AS avgdl
        |FROM dl),
        |qt(query_id, term) AS (VALUES
        |('qA', 'vector'), ('qA', 'customer'), ('qA', 'merge'), ('qA', 'scan'),
        |('qB', 'table'), ('qB', 'stream'), ('qB', 'window'), ('qB', 'sort'),
        |('qC', 'join'), ('qC', 'hash'), ('qC', 'fast'), ('qC', 'slow')),
        |p AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
        |FROM (SELECT doc_id, unnest(w) AS term FROM tk)
        |WHERE term IN (SELECT term FROM qt) GROUP BY 1, 2),
        |f AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM p
        |GROUP BY 1),
        |sc AS (SELECT qt.query_id, p.doc_id,
        |round(SUM(ln((st.nd - f.df + 0.5) / (f.df + 0.5) + 1)
        |* p.tf * 2.2
        |/ (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS score
        |FROM p JOIN qt ON p.term = qt.term
        |JOIN dl ON p.doc_id = dl.doc_id
        |JOIN f ON p.term = f.term CROSS JOIN st GROUP BY 1, 2)
        |SELECT query_id, doc_id, rank, score FROM (SELECT query_id, doc_id,
        |score, ROW_NUMBER() OVER (PARTITION BY query_id
        |ORDER BY score DESC, doc_id) AS rank FROM sc) WHERE rank <= 10
        |ORDER BY query_id, rank""".stripMargin.replace("\n", " "),

    // HLL: register = low 8 hash bits, rho = 25 - bitlength of the
    // remaining 24 (exact bin() arithmetic, the p03 idiom); the
    // harmonic sum is all exact powers of two, α_256 is built from
    // integer literals (a decimal literal would be DECIMAL-typed
    // here and round differently), ln drift dies under ROUND(·,4).
    "t24_hll_distinct" -> {
      val hs = h("sh")
      s"""WITH tk AS (SELECT source,
         |list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
         |FROM documents),
         |sg AS (SELECT source, unnest(CASE WHEN len(w) >= 3 THEN
         |list_transform(generate_series(1, len(w) - 2),
         |j -> concat_ws(' ', w[j], w[j+1], w[j+2])) ELSE [] END) AS sh
         |FROM tk),
         |hv AS (SELECT source, $hs AS hv FROM sg),
         |rr AS (SELECT source, hv % 256 AS reg,
         |CASE WHEN hv // 256 = 0 THEN CAST(25 AS BIGINT)
         |ELSE 25 - length(bin(hv // 256)) END AS rho FROM hv),
         |regs AS (SELECT source, reg, MAX(rho) AS mj FROM rr GROUP BY 1, 2),
         |mrg AS (SELECT '*' AS source, reg, MAX(mj) AS mj FROM regs GROUP BY 2),
         |ar AS (SELECT * FROM regs UNION ALL SELECT * FROM mrg),
         |ag AS (SELECT source, SUM(1.0 / CAST(1 << mj AS DOUBLE)) AS z_hit,
         |CAST(COUNT(*) AS BIGINT) AS n_regs FROM ar GROUP BY 1),
         |es AS (SELECT source, n_regs, 256 - n_regs AS v,
         |CAST(7213 AS DOUBLE) / 10000 / (1 + CAST(1079 AS DOUBLE) / 1000 / 256)
         |* 65536 / (z_hit + CAST(256 - n_regs AS DOUBLE)) AS e_raw FROM ag),
         |fe AS (SELECT source, n_regs,
         |ROUND(CASE WHEN e_raw <= 640 AND v > 0
         |THEN 256 * ln(CAST(256 AS DOUBLE) / v) ELSE e_raw END, 4) AS hll_est FROM es),
         |exs AS (SELECT source, CAST(COUNT(DISTINCT sh) AS BIGINT) AS n_exact
         |FROM sg GROUP BY 1),
         |exg AS (SELECT '*' AS source, CAST(COUNT(DISTINCT sh) AS BIGINT)
         |AS n_exact FROM sg),
         |ex AS (SELECT * FROM exs UNION ALL SELECT * FROM exg)
         |SELECT ex.source, n_exact, n_regs, hll_est,
         |ROUND(100 * (hll_est - n_exact) / n_exact, 2) AS err_pct
         |FROM ex JOIN fe ON ex.source = fe.source
         |ORDER BY ex.source""".stripMargin.replace("\n", " ")
    },

    // RRF closed form: the t23 lexical CTEs + the e02 cosine shape
    // (query = vec 0), fused on the k-bounded lists only.
    "e20_hybrid_rrf" ->
      s"""WITH tok AS (SELECT doc_id,
         |list_filter(string_split(text, ' '), x -> len(x) > 0) AS w
         |FROM documents),
         |dl AS (SELECT doc_id, CAST(len(w) AS DOUBLE) AS dl FROM tok),
         |st AS (SELECT CAST(COUNT(*) AS DOUBLE) AS nd, AVG(dl) AS avgdl
         |FROM dl),
         |p AS (SELECT doc_id, term, CAST(COUNT(*) AS DOUBLE) AS tf
         |FROM (SELECT doc_id, unnest(w) AS term FROM tok)
         |WHERE term IN ('vector', 'customer', 'merge', 'scan')
         |GROUP BY doc_id, term),
         |f AS (SELECT term, CAST(COUNT(*) AS DOUBLE) AS df FROM p
         |GROUP BY term),
         |sc AS (SELECT p.doc_id,
         |round(SUM(ln((st.nd - f.df + 0.5) / (f.df + 0.5) + 1)
         |* p.tf * 2.2
         |/ (p.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / st.avgdl))), 6) AS score
         |FROM p JOIN dl ON p.doc_id = dl.doc_id
         |JOIN f ON p.term = f.term CROSS JOIN st GROUP BY p.doc_id),
         |lex AS (SELECT doc_id, rank AS lex_rank FROM (SELECT doc_id,
         |ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS rank FROM sc)
         |WHERE rank <= 10),
         |$vecCte, $normCte,
         |vsc AS (SELECT c.vec_id AS doc_id,
         |round(${dotSql("q.e", "c.e")} / (q.nr * c.nr), 6) AS cos
         |FROM n q JOIN n c ON q.vec_id = 0 AND c.vec_id <> 0),
         |vec AS (SELECT doc_id, vec_rank FROM (SELECT doc_id,
         |ROW_NUMBER() OVER (ORDER BY cos DESC, doc_id) AS vec_rank FROM vsc)
         |WHERE vec_rank <= 10),
         |fused AS (SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
         |l.lex_rank, v.vec_rank,
         |round(COALESCE(CAST(1 AS DOUBLE) / (60 + l.lex_rank), 0)
         |+ COALESCE(CAST(1 AS DOUBLE) / (60 + v.vec_rank), 0), 6) AS rrf
         |FROM lex l FULL JOIN vec v ON l.doc_id = v.doc_id)
         |SELECT doc_id, rank, lex_rank, vec_rank, rrf FROM (SELECT doc_id,
         |lex_rank, vec_rank, rrf,
         |ROW_NUMBER() OVER (ORDER BY rrf DESC, doc_id) AS rank FROM fused)
         |WHERE rank <= 10""".stripMargin.replace("\n", " "),

    "t12_charclass" ->
      """SELECT doc_id,
        |round(CAST(length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) AS DOUBLE)
        |/ length(text), 6) AS letter_frac,
        |round(CAST(length(regexp_replace(text, '[^0-9]', '', 'g')) AS DOUBLE)
        |/ length(text), 6) AS digit_frac,
        |round(CAST(length(regexp_replace(text, '[^ ]', '', 'g')) AS DOUBLE)
        |/ length(text), 6) AS space_frac,
        |round((length(text)
        |- length(regexp_replace(text, '[^a-zA-Z]', '', 'g'))
        |- length(regexp_replace(text, '[^0-9]', '', 'g'))
        |- length(regexp_replace(text, '[^ ]', '', 'g')))
        |/ CAST(length(text) AS DOUBLE), 6) AS other_frac,
        |CASE WHEN length(regexp_replace(text, '[^a-zA-Z]', '', 'g')) > 0
        |THEN round(CAST(length(regexp_replace(text, '[^A-Z]', '', 'g')) AS DOUBLE)
        |/ length(regexp_replace(text, '[^a-zA-Z]', '', 'g')), 6)
        |ELSE 0.0 END AS upper_frac
        |FROM documents""".stripMargin.replace("\n", " "),

    "e05_quantize" ->
      s"""WITH $vecCte,
         |m AS (SELECT vec_id, e,
         |list_max(list_transform(e, x -> abs(x))) AS ma FROM v)
         |SELECT vec_id,
         |CASE WHEN ma = 0 THEN 0.0 ELSE 127.0 / ma END AS scale,
         |array_to_string(list_transform(
         |CASE WHEN ma = 0 THEN list_transform(e, x -> 0)
         |ELSE list_transform(e, x -> CAST(floor(x * (127.0 / ma) + 0.5) AS INTEGER))
         |END, y -> CAST(y AS VARCHAR)), ',') AS qvec_csv
         |FROM m""".stripMargin.replace("\n", " "),

    "t06_vocab" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT unnest(w) AS token FROM w),
         |counts AS (SELECT token, COUNT(*) AS n FROM tok GROUP BY token)
         |SELECT token, n, ROW_NUMBER() OVER (ORDER BY n DESC, token) AS rank
         |FROM counts ORDER BY n DESC, token LIMIT 100"""
        .stripMargin.replace("\n", " "),

    // Bigrams via LEAD over (doc, pos); probabilities and the ln/avg
    // reduction follow the t09 precedent (IEEE-double in both engines,
    // rounded to 6 dp at the end).
    "t15_bigram_logprob" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t,
         |generate_subscripts(w, 1) AS pos FROM w),
         |bi AS (SELECT doc, w1, w2 FROM (
         |SELECT doc, t AS w1,
         |LEAD(t) OVER (PARTITION BY doc ORDER BY pos) AS w2 FROM tok)
         |WHERE w2 IS NOT NULL),
         |c2 AS (SELECT w1, w2, COUNT(*) AS c2 FROM bi GROUP BY 1, 2),
         |c1 AS (SELECT w1, COUNT(*) AS c1 FROM bi GROUP BY 1),
         |vv AS (SELECT COUNT(DISTINCT t) AS v FROM tok)
         |SELECT doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
         |round(AVG(-ln((CAST(c2 AS DOUBLE) + 1.0)
         |/ (CAST(c1 AS DOUBLE) + CAST(v AS DOUBLE)))), 6)
         |AS avg_neg_logprob
         |FROM bi JOIN c2 USING (w1, w2) JOIN c1 USING (w1) CROSS JOIN vv
         |GROUP BY doc""".stripMargin.replace("\n", " "),

    // Gopher gate: five per-document rules + n_fail + pass. Ratio
    // rules carry the same len>0 guards as the Spark side so an empty
    // document fails as plain false in both engines.
    "t16_gopher_rules" ->
      s"""WITH $wordsCte,
         |r AS (SELECT doc AS doc_id,
         |CAST(len(w) AS BIGINT) AS n_tokens,
         |len(w) BETWEEN 25 AND 100000 AS r_word_count,
         |(len(w) > 0 AND
         |CAST(list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b)
         |AS DOUBLE) / CAST(len(w) AS DOUBLE) BETWEEN 3.0 AND 10.0)
         |AS r_mean_len,
         |(length(text) > 0 AND
         |CAST(length(regexp_replace(text, '[a-z A-Z]', '', 'g')) AS DOUBLE)
         |/ CAST(length(text) AS DOUBLE) <= 0.1) AS r_symbol,
         |(len(w) > 0 AND
         |CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.8) AS r_alpha_words,
         |len(list_distinct(list_filter(w, x -> $stopIn))) >= 2
         |AS r_stop_kinds FROM w),
         |f AS (SELECT *, 5 - (CAST(r_word_count AS BIGINT)
         |+ CAST(r_mean_len AS BIGINT) + CAST(r_symbol AS BIGINT)
         |+ CAST(r_alpha_words AS BIGINT) + CAST(r_stop_kinds AS BIGINT))
         |AS nf FROM r)
         |SELECT doc_id, n_tokens, r_word_count, r_mean_len, r_symbol,
         |r_alpha_words, r_stop_kinds, CAST(nf AS BIGINT) AS n_fail,
         |nf = 0 AS pass FROM f""".stripMargin.replace("\n", " "),

    // The funnel recomputed stage by stage: t01's lang pick, t16's
    // five rules as one conjunction, t08's repetition flag via the
    // keyed-agg CTEs (the Spark side computes the same flag per-row
    // from a sorted-run fold — max multiplicity == longest equal run
    // of the sorted list, identical after the shared 6-dp rounding).
    // Token-less docs have no repetition row -> LEFT JOIN + COALESCE
    // false, mirroring the Spark side's n > 0 guards.
    // Same fixed-order progressive masking as Text.piiScrub; counts
    // taken on the text each pattern actually scanned. Patterns are
    // in the Java-regex ∩ RE2 subset, so both engines see identical
    // matches.
    "t20_pii_scrub" -> {
      val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
      val ip = "\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"
      val num = "\\b\\d{9,}\\b"
      s"""WITH src AS (SELECT doc_id,
         |text || ' contact user' || doc_id || '@example.com from 10.0.'
         | || (doc_id % 256) || '.1 ref 99999999' || doc_id AS text
         |FROM documents),
         |e AS (SELECT doc_id,
         |CAST(len(regexp_extract_all(text, '$email')) AS BIGINT) AS n_emails,
         |regexp_replace(text, '$email', '<EMAIL>', 'g') AS t1 FROM src),
         |i AS (SELECT doc_id, n_emails,
         |CAST(len(regexp_extract_all(t1, '$ip')) AS BIGINT) AS n_ips,
         |regexp_replace(t1, '$ip', '<IP>', 'g') AS t2 FROM e)
         |SELECT doc_id, n_emails, n_ips,
         |CAST(len(regexp_extract_all(t2, '$num')) AS BIGINT) AS n_ids,
         |regexp_replace(t2, '$num', '<ID>', 'g') AS clean FROM i"""
        .stripMargin.replace("\n", " ")
    },

    "t18_quality_funnel" -> {
      val langs = Text.LangMarkers.toSeq.sortBy(_._1)
      val names = langs.map(_._1)
      val scoreExprs = langs.map { case (l, ws) =>
        s"CAST(len(list_filter(w, x -> ${markerIn(ws)})) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val caseChain = names.init.zipWithIndex.map { case (l, i) =>
        val ge = names.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""WITH $wordsCte,
         |sc AS (SELECT doc, $scoreExprs FROM w),
         |lang AS (SELECT doc, CASE $caseChain ELSE '${names.last}' END
         |AS predicted FROM sc),
         |gr AS (SELECT doc, (len(w) BETWEEN 25 AND 100000
         |AND (len(w) > 0 AND
         |CAST(list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b)
         |AS DOUBLE) / CAST(len(w) AS DOUBLE) BETWEEN 3.0 AND 10.0)
         |AND (length(text) > 0 AND
         |CAST(length(regexp_replace(text, '[a-z A-Z]', '', 'g')) AS DOUBLE)
         |/ CAST(length(text) AS DOUBLE) <= 0.1)
         |AND (len(w) > 0 AND
         |CAST(len(list_filter(w, x -> regexp_matches(x, '[a-zA-Z]')))
         |AS DOUBLE) / CAST(len(w) AS DOUBLE) >= 0.8)
         |AND len(list_distinct(list_filter(w, x -> $stopIn))) >= 2)
         |AS pass FROM w),
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |tc AS (SELECT doc, t, COUNT(*) AS c FROM tok GROUP BY doc, t),
         |ts AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |MAX(c) AS top_c FROM tc GROUP BY doc),
         |g2 AS (SELECT doc, unnest(CASE WHEN len(w) >= 2 THEN
         |list_transform(generate_series(1, len(w) - 1),
         |j -> concat_ws(' ', w[j], w[j+1])) ELSE [] END) AS g FROM w),
         |gs AS (SELECT doc, COUNT(*) AS n2, COUNT(DISTINCT g) AS nd2
         |FROM g2 GROUP BY doc),
         |rep AS (SELECT ts.doc,
         |(round(CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) > 0.2
         |OR coalesce(round(1.0 - CAST(nd2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6),
         |0.0) > 0.4) AS repetitive
         |FROM ts LEFT JOIN gs ON gs.doc = ts.doc),
         |f AS (SELECT w.doc, (lang.predicted = 'en') AS f_lang,
         |((lang.predicted = 'en') AND gr.pass) AS f_gopher,
         |((lang.predicted = 'en') AND gr.pass
         |AND NOT COALESCE(rep.repetitive, FALSE)) AS f_rep
         |FROM w JOIN lang ON lang.doc = w.doc JOIN gr ON gr.doc = w.doc
         |LEFT JOIN rep ON rep.doc = w.doc)
         |SELECT '1_all' AS stage, CAST(COUNT(*) AS BIGINT) AS n FROM f
         |UNION ALL SELECT '2_lang',
         |CAST(SUM(CASE WHEN f_lang THEN 1 ELSE 0 END) AS BIGINT) FROM f
         |UNION ALL SELECT '3_gopher',
         |CAST(SUM(CASE WHEN f_gopher THEN 1 ELSE 0 END) AS BIGINT) FROM f
         |UNION ALL SELECT '4_repetition',
         |CAST(SUM(CASE WHEN f_rep THEN 1 ELSE 0 END) AS BIGINT) FROM f"""
        .stripMargin.replace("\n", " ")
    },

    "t14_integrity" ->
      """SELECT
        |(SELECT COUNT(*) FROM documents) AS n_docs,
        |(SELECT COUNT(CASE WHEN text IS NULL OR length(trim(text)) = 0
        |THEN 1 END) FROM documents) AS n_empty_text,
        |(SELECT COUNT(*) - COUNT(DISTINCT doc_id) FROM documents)
        |AS n_dup_doc_ids,
        |(SELECT COUNT(*) FROM embeddings) AS n_vecs,
        |(SELECT COUNT(*) - COUNT(DISTINCT vec_id) FROM embeddings)
        |AS n_dup_vec_ids,
        |(SELECT COUNT(*) FROM documents d LEFT JOIN embeddings e
        |ON e.vec_id = d.doc_id WHERE e.vec_id IS NULL)
        |AS n_docs_without_vec,
        |(SELECT COUNT(*) FROM embeddings e LEFT JOIN documents d
        |ON d.doc_id = e.vec_id WHERE d.doc_id IS NULL)
        |AS n_vecs_without_doc""".stripMargin.replace("\n", " "),

    // ln() is IEEE-double in both engines; scores round to 6 dp before
    // the rank so both engines order the identical list.
    "t13_tfidf" ->
      s"""WITH $wordsCte,
         |tf AS (SELECT doc AS doc_id, t.term, COUNT(*) AS tf
         |FROM (SELECT doc, unnest(w) AS term FROM w) t GROUP BY 1, 2),
         |dfr AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
         |n AS (SELECT COUNT(*) AS n FROM documents),
         |sc AS (SELECT tf.doc_id, tf.term,
         |round(CAST(tf.tf AS DOUBLE)
         |* ln(CAST(n.n AS DOUBLE) / CAST(dfr.df AS DOUBLE)), 6) AS tfidf
         |FROM tf JOIN dfr USING (term) CROSS JOIN n)
         |SELECT doc_id, term, tfidf, rank FROM (
         |SELECT doc_id, term, tfidf, ROW_NUMBER() OVER
         |(PARTITION BY doc_id ORDER BY tfidf DESC, term) AS rank FROM sc)
         |WHERE rank <= 3""".stripMargin.replace("\n", " "),

    "t07_redact" ->
      """SELECT event_id,
        |regexp_replace(props, '[0-9]{2,}', '<NUM>', 'g') AS redacted,
        |CAST(len(regexp_extract_all(props, '[0-9]{2,}')) AS BIGINT) AS n_redacted
        |FROM events""".stripMargin.replace("\n", " "),

    // Same aggregation chain as the Spark side: token counts →
    // per-doc stats; 2-grams via the 1-based window construction.
    // A 1-token doc has no 2-gram row → LEFT JOIN + coalesce(., 0).
    "t08_repetition" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |tc AS (SELECT doc, t, COUNT(*) AS c FROM tok GROUP BY doc, t),
         |ts AS (SELECT doc, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |MAX(c) AS top_c, COUNT(*) AS n_distinct FROM tc GROUP BY doc),
         |g2 AS (SELECT doc, unnest(CASE WHEN len(w) >= 2 THEN
         |list_transform(generate_series(1, len(w) - 1),
         |j -> concat_ws(' ', w[j], w[j+1])) ELSE [] END) AS g FROM w),
         |gs AS (SELECT doc, COUNT(*) AS n2, COUNT(DISTINCT g) AS nd2
         |FROM g2 GROUP BY doc),
         |fr AS (SELECT ts.doc AS doc_id, n_tokens,
         |round(CAST(top_c AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |AS top_token_frac,
         |round(1.0 - CAST(n_distinct AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6)
         |AS dup_token_frac,
         |coalesce(round(1.0 - CAST(nd2 AS DOUBLE) / CAST(n2 AS DOUBLE), 6), 0.0)
         |AS dup_2gram_frac
         |FROM ts LEFT JOIN gs ON gs.doc = ts.doc)
         |SELECT doc_id, n_tokens, top_token_frac, dup_token_frac,
         |dup_2gram_frac,
         |CAST(CASE WHEN top_token_frac > 0.2 OR dup_2gram_frac > 0.4
         |THEN 1 ELSE 0 END AS BIGINT) AS repetitive
         |FROM fr""".stripMargin.replace("\n", " "),

    "t09_logprob" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |freq AS (SELECT t, COUNT(*) AS n FROM tok GROUP BY t),
         |tot AS (SELECT CAST(SUM(n) AS BIGINT) AS total FROM freq)
         |SELECT doc AS doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
         |round(AVG(-ln(CAST(n AS DOUBLE) / CAST(total AS DOUBLE))), 6)
         |AS avg_neg_logprob
         |FROM tok JOIN freq USING (t) CROSS JOIN tot
         |GROUP BY doc""".stripMargin.replace("\n", " "),

    "t10_entropy" ->
      s"""WITH $wordsCte,
         |tok AS (SELECT doc, unnest(w) AS t FROM w),
         |tc AS (SELECT doc, t, COUNT(*) AS c FROM tok GROUP BY doc, t)
         |SELECT doc AS doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
         |CAST(COUNT(*) AS BIGINT) AS n_distinct,
         |round(ln(CAST(SUM(c) AS DOUBLE))
         |- SUM(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE)))
         |/ CAST(SUM(c) AS DOUBLE), 6) AS token_entropy
         |FROM tc GROUP BY doc""".stripMargin.replace("\n", " "),

    "p03_length_buckets" ->
      """WITH tk AS (SELECT doc_id,
        |CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        |CAST(length(bin(GREATEST(n_tokens, 1))) - 1 AS BIGINT) AS bucket
        |FROM tk),
        |r AS (SELECT doc_id, n_tokens, bucket,
        |CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id)
        |AS BIGINT) AS rn FROM b)
        |SELECT doc_id, n_tokens, bucket, (rn - 1) // 8 AS batch_id,
        |(rn - 1) % 8 AS pos_in_batch FROM r"""
        .stripMargin.replace("\n", " "),

    // p03's batches rolled up: dynamic pad target, token mass, pad
    // fraction per (bucket, batch) — exact integers until the final
    // division.
    "p04_padding_audit" ->
      """WITH tk AS (SELECT doc_id,
        |CAST(len(list_filter(string_split(text, ' '), x -> len(x) > 0))
        |AS BIGINT) AS n_tokens FROM documents),
        |b AS (SELECT doc_id, n_tokens,
        |CAST(length(bin(GREATEST(n_tokens, 1))) - 1 AS BIGINT) AS bucket
        |FROM tk),
        |r AS (SELECT doc_id, n_tokens, bucket,
        |CAST(ROW_NUMBER() OVER (PARTITION BY bucket ORDER BY doc_id)
        |AS BIGINT) AS rn FROM b),
        |g AS (SELECT bucket, (rn - 1) // 8 AS batch_id,
        |CAST(COUNT(*) AS BIGINT) AS n_docs,
        |CAST(MAX(n_tokens) AS BIGINT) AS pad_to,
        |CAST(SUM(n_tokens) AS BIGINT) AS batch_tokens
        |FROM r GROUP BY bucket, (rn - 1) // 8)
        |SELECT bucket, batch_id, n_docs, pad_to, batch_tokens,
        |n_docs * pad_to - batch_tokens AS pad_tokens,
        |round(CAST(n_docs * pad_to - batch_tokens AS DOUBLE)
        |/ CAST(n_docs * pad_to AS DOUBLE), 6) AS pad_frac
        |FROM g""".stripMargin.replace("\n", " "),

    "t11_cms_freq" -> {
      val cell = h("CAST(r.range AS VARCHAR) || ':' || t")
      s"""WITH $wordsCte,
         |tok AS (SELECT unnest(w) AS t FROM w),
         |cnt AS (SELECT t, CAST(COUNT(*) AS BIGINT) AS true_n
         |FROM tok GROUP BY t),
         |top AS (SELECT t, true_n FROM cnt ORDER BY true_n DESC, t LIMIT 50),
         |bld AS (SELECT lane, cell, CAST(COUNT(*) AS BIGINT) AS n FROM (
         |SELECT r.range AS lane, MOD($cell, $CmsW) AS cell
         |FROM tok CROSS JOIN range(0, $CmsD) r) GROUP BY lane, cell),
         |pc AS (SELECT t, r.range AS lane, MOD($cell, $CmsW) AS cell
         |FROM top CROSS JOIN range(0, $CmsD) r)
         |SELECT top.t AS token, top.true_n, MIN(b.n) AS cms_n
         |FROM pc JOIN bld b USING (lane, cell) JOIN top ON top.t = pc.t
         |GROUP BY 1, 2""".stripMargin.replace("\n", " ")
    },

    "d17_bloom_prefilter" -> {
      val bit = h("CAST(r.range AS VARCHAR) || ':' || s")
      s"""WITH $wordsCte, $shinglesCte,
         |shd AS (SELECT DISTINCT doc, s FROM sh),
         |bk AS (SELECT doc, MOD(${h("doc")}, 100) AS b FROM w),
         |tr AS (SELECT s FROM shd JOIN bk USING (doc) WHERE b < 80),
         |ev AS (SELECT doc AS eval_doc, s FROM shd JOIN bk USING (doc)
         |WHERE b >= 80 AND b < 90),
         |bits AS (SELECT DISTINCT MOD($bit, $BloomM) AS bit
         |FROM tr CROSS JOIN range(0, $BloomK) r),
         |evs AS (SELECT DISTINCT s FROM ev),
         |pb AS (SELECT s, MOD($bit, $BloomM) AS pbit
         |FROM evs CROSS JOIN range(0, $BloomK) r),
         |probe AS (SELECT s, COUNT(bits.bit) = $BloomK AS bloom_positive
         |FROM pb LEFT JOIN bits ON bits.bit = pb.pbit GROUP BY s),
         |tset AS (SELECT DISTINCT s FROM tr)
         |SELECT eval_doc, CAST(COUNT(*) AS BIGINT) AS n_shingles,
         |CAST(SUM(CASE WHEN bloom_positive THEN 1 ELSE 0 END) AS BIGINT)
         |AS n_bloom,
         |CAST(COUNT(tset.s) AS BIGINT) AS n_exact
         |FROM ev JOIN probe USING (s) LEFT JOIN tset ON tset.s = ev.s
         |GROUP BY eval_doc""".stripMargin.replace("\n", " ")
    },

    "t01_langid" -> {
      val langs = Text.LangMarkers.toSeq.sortBy(_._1)
      val scoreExprs = langs.map { case (l, ws) =>
        s"CAST(len(list_filter(w, x -> ${markerIn(ws)})) AS BIGINT) AS s_$l"
      }.mkString(", ")
      val names = langs.map(_._1)
      val caseChain = names.init.zipWithIndex.map { case (l, i) =>
        val ge = names.drop(i + 1).map(o => s"s_$l >= s_$o").mkString(" AND ")
        s"WHEN $ge THEN '$l'"
      }.mkString(" ")
      s"""WITH $wordsCte,
         |sc AS (SELECT doc AS doc_id, lang AS lang_true, $scoreExprs FROM w)
         |SELECT *, CASE $caseChain ELSE '${names.last}' END AS predicted FROM sc"""
        .stripMargin.replace("\n", " ")
    },

    "t02_quality" ->
      s"""WITH $wordsCte
         |SELECT doc AS doc_id,
         |CAST(len(w) AS BIGINT) AS n_tokens,
         |CAST(list_reduce(list_transform(w, x -> len(x)), (a, b) -> a + b) AS DOUBLE)
         |/ CAST(len(w) AS DOUBLE) AS mean_token_len,
         |CAST(len(list_filter(w, x -> $stopIn)) AS DOUBLE)
         |/ CAST(len(w) AS DOUBLE) AS stopword_ratio,
         |CAST(length(regexp_replace(text, '[a-z A-Z]', '', 'g')) AS DOUBLE)
         |/ CAST(length(text) AS DOUBLE) AS nonalpha_ratio,
         |round((least(CAST(len(w) AS DOUBLE) / 50.0, 1.0)
         |+ (1.0 - CAST(length(regexp_replace(text, '[a-z A-Z]', '', 'g')) AS DOUBLE)
         |/ CAST(length(text) AS DOUBLE))
         |+ (1.0 - abs(CAST(len(list_filter(w, x -> $stopIn)) AS DOUBLE)
         |/ CAST(len(w) AS DOUBLE) - 0.4))) / 3.0, 6) AS quality
         |FROM w""".stripMargin.replace("\n", " "),

    "t03_token_stats" ->
      s"""WITH $wordsCte
         |SELECT doc AS doc_id, CAST(len(w) AS BIGINT) AS n_tokens,
         |CAST(len(list_filter(regexp_split_to_array(text, '[^a-zA-Z0-9]+'),
         |x -> len(x) > 0))
         |+ length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS BIGINT) AS n_subwords,
         |CAST(len(list_distinct(w)) AS BIGINT) AS n_distinct
         |FROM w""".stripMargin.replace("\n", " "),

    "t04_fingerprint" ->
      s"""WITH $wordsCte
         |SELECT doc AS doc_id,
         |CAST(list_reduce(list_transform(w, (x, i) -> ${h("x")} * i),
         |(a, b) -> a + b) AS BIGINT) AS fp
         |FROM w""".stripMargin.replace("\n", " "),

    "t05_length_quantiles" ->
      """SELECT lang, COUNT(*) AS n,
        |CAST(MIN(length(text)) AS BIGINT) AS min_len,
        |quantile_cont(length(text), 0.5) AS p50,
        |quantile_cont(length(text), 0.9) AS p90,
        |CAST(MAX(length(text)) AS BIGINT) AS max_len
        |FROM documents GROUP BY lang""".stripMargin.replace("\n", " "),

    "m01_media_decode" -> {
      val hv = h("text")
      s"""SELECT doc_id AS media_id, 'image' AS media_type,
         |CAST(octet_length(CAST(text AS BLOB)) AS BIGINT) AS byte_len,
         |320 + MOD($hv, 1600) AS width,
         |240 + MOD($hv // 7, 840) AS height,
         |1 + MOD($hv, 3) AS channels,
         |CASE WHEN MOD($hv, 2) = 0 THEN 'rgb' ELSE 'yuv' END AS format
         |FROM documents""".stripMargin.replace("\n", " ")
    },

    "m02_frame_sample" ->
      """SELECT doc_id AS media_id, CAST(r.range AS BIGINT) AS frame_no,
        |SUBSTR(md5(text), CAST(r.range + 1 AS INTEGER), 8) AS frame_digest
        |FROM documents CROSS JOIN range(0, 4) r""".stripMargin.replace("\n", " "),

    "m03_resize" -> {
      val hv = h("text")
      s"""WITH dec AS (SELECT doc_id AS media_id,
         |320 + MOD($hv, 1600) AS width,
         |240 + MOD($hv // 7, 840) AS height
         |FROM documents)
         |SELECT media_id, width, height,
         |(width * 256) // GREATEST(width, height) AS out_width,
         |(height * 256) // GREATEST(width, height) AS out_height
         |FROM dec""".stripMargin.replace("\n", " ")
    },

    "m04_features" -> {
      def lane(i: Int) =
        s"CAST(CONCAT('0x', SUBSTR(md5(text), ${i * 8 + 1}, 8)) AS BIGINT) / 4294967296.0"
      s"""SELECT doc_id AS media_id, ${lane(0)} AS f0, ${lane(1)} AS f1,
         |${lane(2)} AS f2, ${lane(3)} AS f3
         |FROM documents""".stripMargin.replace("\n", " ")
    })
}
