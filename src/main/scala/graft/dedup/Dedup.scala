package graft.dedup

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable
import graft.text.Text

/**
 * Document deduplication at training-data scale.
 *
 * Four families, in increasing recall/cost:
 *  - exact: hash-groupBy on a content digest (one shuffle on the digest
 *    — uniform keys, no skew).
 *  - MinHash + LSH: shingle → k minhashes → band buckets → bucket join.
 *    The join is on (band, bandHash), so only colliding docs meet;
 *    at 100 TB this is THE standard near-dup pass (candidate pairs ≪
 *    n²).
 *  - SimHash: one 32-bit fingerprint per doc; near-dups = small
 *    Hamming distance, found via band-rotated exact buckets.
 *  - exact n-gram Jaccard: ground-truth pairwise measure, run only on
 *    LSH candidates in production (here also standalone as the oracle-
 *    checkable form).
 *
 * All hashes are [[Portable]] (md5-derived) so an external SQL engine
 * verifies every stage bit-for-bit.
 */
object Dedup {

  /**
   * The materialize-once signature bundle of a dedup run: the token,
   * shingle, MinHash-signature, and SimHash-fingerprint frames a
   * production pipeline computes in ONE corpus pass and then reuses
   * across every candidate generator, verifier, and audit.
   *
   * All four frames are persisted (memory, spilling to disk): the
   * corpus parquet is scanned once, the tokenizer runs once, the
   * shingle explode runs once — at 100 TB that collapses the three
   * corpus scans the naive per-audit recompute costs into one. The
   * frames are tiny relative to the corpus (shingles ≈ corpus tokens,
   * signatures = |docs|·k rows, fingerprints = |docs| rows).
   */
  final case class SignatureSet(tokens: DataFrame, shingles: DataFrame,
      minhash: DataFrame, simhash: DataFrame, bands: DataFrame) {
    /** Drop all five cached frames (end of the dedup run). A no-op for
      * a [[signaturesSpilled]] set, whose frames live in parquet — the
      * owner deletes the spill directory instead. */
    def unpersist(): Unit = {
      tokens.unpersist(); shingles.unpersist()
      minhash.unpersist(); simhash.unpersist(); bands.unpersist()
    }
  }

  /**
   * Compute every dedup signature in one corpus pass and persist the
   * results: tokens → {shingles → MinHash → LSH bands, SimHash}. The
   * returned frames back [[lshCandidatesFromBands]], [[simHashPairs]],
   * [[jaccardForShingles]], [[minHashQualityFrom]] and the d-family
   * gated queries — none of which re-touch the corpus afterwards, and
   * none of which re-run the per-doc band reduction either (`bands` is
   * |docs|·k/r rows, the smallest frame of the set).
   *
   * Storage is SERIALIZED memory spilling to disk: the token/shingle
   * frames are the exploded corpus, and round-7 measured deserialized
   * row caches of them starving every query that ran after the dedup
   * family (eviction churn + GC pressure in a bounded heap). Short
   * in-memory lifetimes only — callers MUST [[SignatureSet.unpersist]]
   * when the dedup run ends; anything longer-lived (a query suite, a
   * multi-corpus service) uses [[signaturesSpilled]].
   */
  def signatures(df: DataFrame, id: Column, text: Column, k: Int,
      shingleN: Int = 3, r: Int = 4): SignatureSet = {
    import org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK_SER
    val toks = tokenFrame(df, id, text).persist(MEMORY_AND_DISK_SER)
    val sh = shingleFrame(toks, shingleN).persist(MEMORY_AND_DISK_SER)
    val mh = minHashFromShingles(sh, k).persist(MEMORY_AND_DISK_SER)
    val fp = simHashFromTokens(toks).persist(MEMORY_AND_DISK_SER)
    val bd = bandSignatures(mh, r).persist(MEMORY_AND_DISK_SER)
    SignatureSet(toks, sh, mh, fp, bd)
  }

  /**
   * [[signatures]], materialized to PARQUET instead of the block
   * cache: each frame is written once under `dir` and read back
   * columnar-compressed, so the signature set holds ZERO executor
   * memory between consumers — the lifecycle a long-lived deployment
   * needs (and what round 7 proved the in-memory cache is not: five
   * deserialized frames pinned for a whole suite made every query
   * after the dedup family slower). Two narrow corpus scans (the
   * shingle chain and the SimHash chain each tokenize in-pass — see
   * the body comment) and one pass per derived frame: MinHash reads
   * the shingle spill, bands read the MinHash spill.
   *
   * The caller owns `dir` (create, reuse-check, delete); frames land
   * at `dir/{shingles,minhash,simhash,bands}`; the `tokens` member of
   * the returned set stays a lazy plan over the corpus.
   */
  def signaturesSpilled(spark: org.apache.spark.sql.SparkSession,
      df: DataFrame, id: Column, text: Column, k: Int,
      shingleN: Int = 3, r: Int = 4, dir: String): SignatureSet = {
    def spill(name: String, frame: DataFrame): DataFrame = {
      val p = s"$dir/$name"
      frame.write.mode("overwrite").parquet(p)
      spark.read.parquet(p)
    }
    // The token frame is NOT spilled: it is corpus-sized, has no
    // consumer outside the two derivations below, and tokenization is
    // one codegen'd split — so the shingle chain and the SimHash chain
    // each re-tokenize in their own single corpus pass (2 cheap narrow
    // scans) instead of paying a corpus-sized parquet write plus two
    // reads. Everything downstream reads the small spilled frames.
    val toks = tokenFrame(df, id, text)
    val sh = spill("shingles", shingleFrame(toks, shingleN))
    val mh = spill("minhash", minHashFromShingles(sh, k))
    val fp = spill("simhash", simHashFromTokens(toks))
    val bd = spill("bands", bandSignatures(mh, r))
    SignatureSet(toks, sh, mh, fp, bd)
  }

  /** Content digest for exact dedup. */
  def digest(text: Column): Column = md5(text)

  /**
   * Exact dedup: one representative (min id) per distinct content
   * digest, with the duplicate count.
   */
  def exact(df: DataFrame, id: Column, text: Column): DataFrame =
    df.groupBy(digest(text).as("digest"))
      .agg(min(id).as("keep_id"), count(lit(1)).as("n_copies"))

  /**
   * MinHash signatures, long relational form: (doc, i, sig).
   *
   * Shape matters for scale: each distinct shingle is md5-hashed
   * exactly ONCE, then fanned out into k cheap affine transforms and
   * min-aggregated per (doc, i). The array-native alternative
   * (transform over a k-sequence) inlines the hash subtree into every
   * signature lane — k× the md5 work and no codegen CSE inside
   * higher-order functions — and measured 40× slower. The groupBy is
   * partial-aggregation friendly (map-side min), so the shuffle
   * carries at most |docs|·k rows.
   */
  /** (doc, tokens) — the single tokenizer pass every signature and
    * verify stage derives from. Materialized once per corpus by
    * [[signatures]]. */
  def tokenFrame(df: DataFrame, id: Column, text: Column): DataFrame =
    df.select(id.as("doc"), Text.tokens(text).as("w"))

  /** (doc, shingle) exploded from a (doc, tokens) frame — tokens are
    * materialized ONCE per row (see Text.shinglesOf for why the
    * two-step projection matters). */
  def shingleFrame(toks: DataFrame, shingleN: Int): DataFrame =
    toks.select(col("doc"), explode(Text.shingleSetOf(col("w"), shingleN)).as("s"))

  /** (doc, shingle) straight from the corpus — the unshared form;
    * production pipelines go through [[signatures]] instead. */
  private def explodedShingles(df: DataFrame, id: Column, text: Column,
      shingleN: Int): DataFrame =
    shingleFrame(tokenFrame(df, id, text), shingleN)

  /** MinHash signatures from an exploded (doc, shingle) frame. */
  def minHashFromShingles(sh: DataFrame, k: Int): DataFrame = {
    val hashed = sh.select(col("doc"), Portable.hash64(col("s")).as("h"))
    // Single pass: k min-aggregates over one shingle row (map-side
    // partial agg, no ×k row fan-out), then unpivot to (doc, i, sig).
    val mins = (0 until k).map { i =>
      min(pmod(col("h") * (1000003L * (i + 1) + 12345L) +
        (998244353L * (i + 1) + 7L), lit(Portable.MinHashPrime))).as(s"s$i")
    }
    hashed
      .groupBy(col("doc"))
      .agg(mins.head, mins.tail: _*)
      .selectExpr("doc",
        s"stack($k, ${(0 until k).map(i => s"$i, s$i").mkString(", ")}) AS (i, sig)")
  }

  def minHashLong(df: DataFrame, id: Column, text: Column, k: Int,
      shingleN: Int = 3): DataFrame =
    minHashFromShingles(explodedShingles(df, id, text, shingleN), k)

  /**
   * LSH candidate pairs: split the k-signature into bands of r rows;
   * docs sharing any full band are candidates. Returns (doc_a, doc_b,
   * n_bands) with doc_a < doc_b. The pair join is an equi-join on
   * (band, bandHash) — only colliding docs ever meet.
   */
  def lshCandidates(df: DataFrame, id: Column, text: Column, k: Int, r: Int): DataFrame =
    lshCandidatesFromSig(minHashLong(df, id, text, k), r)

  /** LSH band-bucket rows (doc, band, bh) from a (doc, i, sig)
    * signature frame: the k-signature split into bands of r rows,
    * each band reduced to one portable hash — the join key of
    * [[lshCandidatesFromSig]] and the dedup key of the streaming
    * band-admission gate. */
  def bandSignatures(sig: DataFrame, r: Int): DataFrame =
    sig
      .groupBy(col("doc"), (col("i") / r).cast("int").as("band"))
      .agg(Portable.hash64(concat_ws(",",
        transform(array_sort(collect_list(struct(col("i"), col("sig")))),
          x => x.getField("sig").cast("string")))).as("bh"))

  /** LSH banding over an already-computed (doc, i, sig) signature
    * frame — the shared-signature form of [[lshCandidates]]. */
  def lshCandidatesFromSig(sig: DataFrame, r: Int): DataFrame =
    lshCandidatesFromBands(bandSignatures(sig, r))

  /** Candidate pairs straight from a (doc, band, bh) band frame —
    * the shared-band form that skips even the band reduction. */
  def lshCandidatesFromBands(bands: DataFrame): DataFrame = {
    val a = bands.as("a")
    val b = bands.as("b")
    a.join(b,
        col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
          col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /**
   * Incremental dedup of an incoming batch against a PERSISTED corpus
   * band index — the production shape for a corpus that grows by
   * ingestion batches: the corpus's (doc, band, bh) band signatures
   * (see [[bandSignatures]]) are computed once and stored durably;
   * each new batch scans ONLY itself, computes its own bands, and
   * equi-joins the index on (band, bh). Admission is incremental —
   * nothing ever rescans corpus text, and the index grows by
   * appending the admitted batch's bands.
   *
   * `batchDocs` carries the full batch id set (docs too short to
   * shingle have no bands but still need a not-a-dup verdict).
   * Returns one row per batch doc: (doc, n_dups, first_dup) — the
   * count of distinct colliding corpus docs and the smallest matching
   * corpus id (-1 when the doc is new to the corpus).
   */
  def indexDedupBatch(index: DataFrame, batchBands: DataFrame,
      batchDocs: DataFrame): DataFrame = {
    val idx = index.select(col("doc").as("corpus_doc"), col("band"), col("bh"))
    // No forced broadcast: the streaming ingest loops pass a small
    // per-epoch batch (which the planner auto-broadcasts under the
    // threshold), but d19's batch is a fixed 1-in-5 corpus slice —
    // O(corpus), not O(batch) — and a mandatory broadcast of it would
    // hit the 8 GB broadcast limit at scale. The equi-join keys let
    // the planner pick broadcast vs shuffle per actual sizes.
    val hits = idx.join(batchBands, Seq("band", "bh"))
      .groupBy(col("doc"))
      .agg(countDistinct(col("corpus_doc")).as("n_dups"),
        min(col("corpus_doc")).as("first_dup"))
    batchDocs.join(hits, Seq("doc"), "left")
      .select(col("doc"),
        coalesce(col("n_dups"), lit(0L)).as("n_dups"),
        coalesce(col("first_dup"), lit(-1L)).as("first_dup"))
  }

  /**
   * The write-back half of the incremental dedup loop: the bands of
   * batch docs the [[indexDedupBatch]] verdicts ADMITTED (no corpus
   * collision) — in production, append-mode-written to the index path
   * so the next batch dedups against corpus + everything admitted so
   * far. Flagged dups contribute nothing: the colliding corpus doc
   * already carries their buckets.
   *
   * Intra-batch duplicates are resolved here too, conservatively: a
   * doc sharing a band with a LOWER-id corpus-clean batch doc is also
   * dropped, so two copies arriving in the same batch admit exactly
   * one. (Strictly-sequential admission could keep a doc whose only
   * collision partner was itself dropped; the conservative rule errs
   * toward dropping — never toward letting a duplicate into the
   * index.)
   */
  def admitBands(batchBands: DataFrame, verdicts: DataFrame): DataFrame = {
    // No forced broadcast (see indexDedupBatch): d19-style callers
    // pass corpus-slice "batches", so sizing is the planner's call —
    // every join here is keyed, never a product.
    val clean = batchBands.join(
      verdicts.filter(col("n_dups") === 0).select(col("doc")), Seq("doc"))
    val earlier = clean.select(
      col("doc").as("lo"), col("band").as("eb"), col("bh").as("ebh"))
    val intraDups = clean.join(earlier,
        col("band") === col("eb") && col("bh") === col("ebh") &&
          col("lo") < col("doc"))
      .select(col("doc")).distinct()
    clean.join(intraDups, Seq("doc"), "left_anti")
  }

  /** SimHash width: 63 bits (2^63-1 is the signed-64 max, so the
    * fingerprint and every shift stay overflow-free in any engine). */
  val SimHashBits = 63
  private val SimHashBandBits = 9 // 7 bands × 9 bits

  /**
   * 63-bit SimHash per document: sign of the per-bit vote over token
   * hashes. Relational form (explode tokens, 63 conditional-sum
   * aggregates in one pass) so the partial-aggregation path handles any
   * document size; the fingerprint is reassembled from the votes.
   */
  def simHash(df: DataFrame, id: Column, text: Column): DataFrame =
    simHashFromTokens(tokenFrame(df, id, text))

  /** SimHash fingerprints from a (doc, tokens) frame — the
    * shared-tokenizer form of [[simHash]]. */
  def simHashFromTokens(tokens: DataFrame): DataFrame = {
    val toks = tokens.select(col("doc"), explode(col("w")).as("tok"))
      .withColumn("h", Portable.hash63(col("tok")))
    val votes = (0 until SimHashBits).map { j =>
      sum(when(shiftright(col("h"), j).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$j")
    }
    val agg = toks.groupBy(col("doc")).agg(votes.head, votes.tail: _*)
    val fp = (0 until SimHashBits).map { j =>
      when(col(s"b$j") > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)
    agg.select(col("doc"), fp.as("simhash"))
  }

  /**
   * SimHash near-dup pairs: exact match on any of seven 9-bit bands,
   * then verify Hamming distance <= maxHamming via bit_count(xor).
   */
  def simHashPairs(fps: DataFrame, maxHamming: Int): DataFrame = {
    val banded = fps.select(col("doc"), col("simhash"),
      posexplode(array((0 until SimHashBits / SimHashBandBits).map(b =>
        shiftright(col("simhash"), b * SimHashBandBits).bitwiseAND(511)): _*))
        .as(Seq("band", "bh")))
    val a = banded.as("a")
    val b = banded.as("b")
    a.join(b, col("a.band") === col("b.band") && col("a.bh") === col("b.bh") &&
        col("a.doc") < col("b.doc"))
      .select(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"),
        bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /**
   * Exact Jaccard verification of LSH candidate pairs — the production
   * near-dup shape at 100 TB: the O(n²)-ish shingle self-join only ever
   * runs over docs that already collided in a MinHash band, so the
   * verify cost is |candidates|·|shingles| instead of all-pairs.
   *
   * The candidate side carries NO broadcast hint on purpose: a
   * near-dup-heavy 100 TB corpus yields 10⁸–10⁹ candidate pairs, far
   * past any broadcast/driver limit. The joins are plain equi-joins on
   * the doc id, so AQE still broadcasts when the candidate set is
   * actually small and falls back to a shuffle join when it isn't.
   *
   * Threshold semantics: [[jaccardForPairs]] keeps zero-overlap (and
   * shingle-less) candidates as jaccard=0.0 rows, so `threshold <= 0`
   * deliberately INCLUDES them — "every candidate, scored" — rather
   * than silently dropping pairs the index surfaced. Callers wanting
   * only overlapping pairs pass a positive threshold.
   */
  def jaccardOnCandidates(df: DataFrame, id: Column, text: Column,
      shingleN: Int, threshold: Double, k: Int, r: Int): DataFrame =
    jaccardForPairs(df, id, text, shingleN,
      lshCandidates(df, id, text, k, r).select(col("doc_a"), col("doc_b")))
      .filter(col("jaccard") >= threshold)

  /**
   * Exact shingle-set Jaccard for a GIVEN (doc_a, doc_b) pair set —
   * the verify kernel of [[jaccardOnCandidates]], reusable under any
   * candidate generator (LSH bands, SimHash bands, their union).
   * Pairs sharing no shingle at all keep a 0.0 row (left join).
   */
  def jaccardForPairs(df: DataFrame, id: Column, text: Column,
      shingleN: Int, pairs: DataFrame): DataFrame =
    jaccardForShingles(explodedShingles(df, id, text, shingleN), pairs)

  /** The same verify kernel over an already-computed (doc, shingle)
    * frame — what a production pipeline runs, with `sh` persisted by
    * [[signatures]] so no candidate generator re-scans the corpus. */
  def jaccardForShingles(sh: DataFrame, pairs: DataFrame): DataFrame =
    jaccardForShingles(sh, pairs,
      sh.groupBy(col("doc")).agg(count(lit(1)).as("n")))

  /** [[jaccardForShingles]] with the per-doc shingle sizes handed in
    * (spilled once per corpus by the caller): `sizes` is referenced
    * TWICE below (the na and nb joins), so as a lazy plan the
    * corpus-sized shingle aggregate ran twice per verify call. */
  def jaccardForShingles(sh: DataFrame, pairs: DataFrame,
      sizes: DataFrame): DataFrame = {
    val cand = pairs.select(col("doc_a"), col("doc_b"))
    val inter = cand
      .join(sh.as("a"), col("doc_a") === col("a.doc"))
      .join(sh.as("b"), col("doc_b") === col("b.doc") && col("a.s") === col("b.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"),
        Seq("doc_a"), "left")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"),
        Seq("doc_b"), "left")
      .withColumn("jaccard", coalesce(
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"),
        lit(0.0)))
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }

  /**
   * Asymmetric CONTAINMENT per candidate pair: |A∩B|/|A| and
   * |A∩B|/|B| alongside the symmetric Jaccard. Containment is the
   * superset-detection signal symmetric Jaccard dilutes: a short
   * document quoted whole inside a long one has high containment in
   * the small direction but low Jaccard (the union is dominated by
   * the long side), so a Jaccard-threshold dedup pass keeps both
   * copies while a containment pass flags the inclusion (the
   * Broder-containment variant of the shingle framework).
   *
   * Scale shape: identical to [[jaccardForShingles]] — candidate-gated
   * equi-joins over the shared shingle frame, one keyed intersection
   * aggregate, two broadcast-size size joins; nothing pairwise beyond
   * the LSH candidates.
   */
  def containmentForShingles(sh: DataFrame, pairs: DataFrame): DataFrame =
    containmentForShingles(sh, pairs,
      sh.groupBy(col("doc")).agg(count(lit(1)).as("n")))

  /** [[containmentForShingles]] with pre-materialized per-doc shingle
    * sizes — same double-reference rationale as the jaccard form. */
  def containmentForShingles(sh: DataFrame, pairs: DataFrame,
      sizes: DataFrame): DataFrame = {
    val cand = pairs.select(col("doc_a"), col("doc_b"))
    val inter = cand
      .join(sh.as("a"), col("doc_a") === col("a.doc"))
      .join(sh.as("b"), col("doc_b") === col("b.doc") && col("a.s") === col("b.s"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("inter"))
    cand
      .join(inter, Seq("doc_a", "doc_b"), "left")
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"),
        Seq("doc_a"), "left")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"),
        Seq("doc_b"), "left")
      .withColumn("i", coalesce(col("inter"), lit(0L)))
      .select(col("doc_a"), col("doc_b"),
        round(col("i").cast("double") /
          (col("na") + col("nb") - col("i")).cast("double"), 6).as("jaccard"),
        round(col("i").cast("double") / col("na").cast("double"), 6)
          .as("containment_a"),
        round(col("i").cast("double") / col("nb").cast("double"), 6)
          .as("containment_b"))
  }

  /**
   * MinHash estimator quality: for every LSH candidate pair, the
   * signature-agreement Jaccard ESTIMATE (matching lanes / k — what
   * the index believes) next to the exact shingle-set Jaccard (the
   * truth) — the dedup-index counterpart of [[graft.ann.Ann.recallAtK]],
   * run before trusting k/r settings on a new corpus.
   *
   * Scale shape: both sides are candidate-gated equi-joins — the
   * estimate joins |candidates|·k signature rows on (doc, lane), the
   * truth is [[jaccardOnCandidates]] at threshold 0. `sum/k` is one
   * exact binary division, so the estimate compares bit-for-bit in
   * any engine.
   */
  def minHashQuality(df: DataFrame, id: Column, text: Column,
      shingleN: Int, k: Int, r: Int): DataFrame =
    minHashQualityFrom(signatures(df, id, text, k, shingleN), k, r)

  /** [[minHashQuality]] over a shared [[SignatureSet]]: the estimate
    * joins the persisted signature frame, the truth joins the persisted
    * shingle frame — zero corpus re-scans per audit. */
  def minHashQualityFrom(sigs: SignatureSet, k: Int, r: Int): DataFrame =
    minHashQualityFromCandidates(sigs, k, lshCandidatesFromBands(sigs.bands))

  /** [[minHashQualityFrom]] over an ALREADY-MATERIALIZED candidate
    * set — the shape a production audit runs, where candidates were
    * generated once and spilled (the r parameter is implied by how
    * the candidates were banded). */
  def minHashQualityFromCandidates(sigs: SignatureSet, k: Int,
      candidates: DataFrame): DataFrame =
    minHashQualityFromCandidates(sigs, k, candidates,
      sigs.shingles.groupBy(col("doc")).agg(count(lit(1)).as("n")))

  /** [[minHashQualityFromCandidates]] with pre-materialized per-doc
    * shingle sizes for the exact-Jaccard half. */
  def minHashQualityFromCandidates(sigs: SignatureSet, k: Int,
      candidates: DataFrame, sizes: DataFrame): DataFrame = {
    val cand = candidates
      .select(col("doc_a"), col("doc_b"))
    val sig = sigs.minhash
    val est = cand
      .join(sig.as("sa"), col("doc_a") === col("sa.doc"))
      .join(sig.as("sb"), col("doc_b") === col("sb.doc") && col("sa.i") === col("sb.i"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg((sum(when(col("sa.sig") === col("sb.sig"), 1L).otherwise(0L))
        .cast("double") / k).as("jaccard_est"))
    est.join(jaccardForShingles(sigs.shingles, cand, sizes),
        Seq("doc_a", "doc_b"))
      .select(col("doc_a"), col("doc_b"), col("jaccard_est"), col("jaccard"))
  }

  /**
   * Connected components over near-dup candidate pairs — the final
   * stage of a production dedup pipeline: pairs → duplicate GROUPS,
   * one canonical id (the minimum member) per group.
   *
   * Algorithm: iterative min-label propagation (the standard
   * large-graph CC on Spark): each round, every node takes the min of
   * its own label and its neighbors' labels; converges in
   * O(component diameter) rounds. Each round is one hash join + one
   * aggregate — shuffle on the node id, no driver-side graph.
   * `localCheckpoint` truncates lineage so plans stay O(1) per round.
   *
   * @param nodes one column `doc` — every doc gets a group (docs in no
   *              pair become singletons)
   * @param edges candidate pairs (aCol, bCol)
   */
  def connectedComponents(nodes: DataFrame, edges: DataFrame,
      aCol: String, bCol: String, maxIter: Int = 20): DataFrame = {
    val sym = edges.select(col(aCol).as("src"), col(bCol).as("dst"))
      .union(edges.select(col(bCol).as("src"), col(aCol).as("dst")))
      .localCheckpoint()
    var labels = nodes.select(col("doc"), col("doc").as("group_id"))
      .localCheckpoint()
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val neighborMin = sym
        .join(labels, sym("src") === labels("doc"))
        .groupBy(col("dst")).agg(min(col("group_id")).as("nmin"))
      // carry the previous label through the checkpoint so the
      // convergence probe is a filter over the materialized frame —
      // not a second join job against the previous checkpoint
      val updated = labels
        .join(neighborMin, labels("doc") === neighborMin("dst"), "left")
        .select(labels("doc"),
          least(col("group_id"), coalesce(col("nmin"), col("group_id")))
            .as("group_id"),
          labels("group_id").as("prev_group_id"))
        .localCheckpoint()
      converged = updated
        .filter(col("group_id") =!= col("prev_group_id")).isEmpty
      labels = updated.select(col("doc"), col("group_id"))
      i += 1
    }
    // Fail loudly instead of returning partially-propagated labels —
    // a silently split duplicate group keeps redundant documents.
    require(converged,
      s"connectedComponents did not converge in $maxIter rounds " +
        "(component diameter exceeds maxIter; raise it)")
    labels
  }

  /**
   * Sub-document segment dedup (the C4/RefinedWeb-style pass that
   * exact/near doc dedup misses): cut each document's token stream
   * into non-overlapping `segLen`-token segments (trailing partial
   * segment included), keep the globally FIRST occurrence of each
   * distinct segment (lowest (doc, seg_idx)), and report per document
   * how much of it is boilerplate already seen elsewhere.
   *
   * Scale shape: explode → groupBy(segment) with a min(struct) partial
   * aggregate (one row per distinct segment crosses the shuffle, never
   * the raw stream) → equi-join back on segment → per-doc rollup. No
   * global window, no pairwise comparison; every stage is keyed.
   */
  def segmentDedup(df: DataFrame, id: Column, text: Column,
      segLen: Int): DataFrame = {
    val nSegs = // ceil(|w| / segLen), 0 for empty docs
      floor((size(col("w")) - lit(1)).cast("double") / lit(segLen.toDouble))
        .cast("int") + lit(1)
    val segs = df.select(id.as("doc"), Text.tokens(text).as("w"))
      .select(col("doc"), posexplode(
        when(size(col("w")) > 0,
          transform(sequence(lit(0), nSegs - 1),
            j => concat_ws(" ", slice(col("w"), j * segLen + 1, lit(segLen)))))
          .otherwise(array().cast("array<string>"))))
      .withColumnRenamed("pos", "seg_idx").withColumnRenamed("col", "seg")
    val keeper = segs.groupBy(col("seg"))
      .agg(min(struct(col("doc"), col("seg_idx"))).as("first"))
    segs.join(keeper, Seq("seg"))
      .withColumn("is_dup",
        (col("doc") =!= col("first.doc") ||
          col("seg_idx") =!= col("first.seg_idx")).cast("long"))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_segments"),
        sum(col("is_dup")).as("n_dup_segments"))
      .withColumn("dup_seg_frac",
        round(col("n_dup_segments").cast("double") /
          col("n_segments").cast("double"), 6))
  }

  /**
   * Rolling-window duplicate-span detection — the overlap-granularity
   * pass [[segmentDedup]]'s fixed non-overlapping segments miss: a
   * duplicated passage that straddles a segment boundary never lines
   * up with a segment, but every stride-1 window inside it collides.
   * This is the Spark-shaped approximation of exact substring dedup
   * (the suffix-array pass of Lee et al. 2021): hash every `winLen`-
   * token window, keep the global first occurrence (lowest (doc,
   * pos)), and report per document how many of its windows were seen
   * before — within the same document (boilerplate repeats) or in any
   * other.
   *
   * Windows are compared by 64-bit portable hash, not text — at
   * 100 TB the shuffle carries 8-byte keys instead of ~50-byte
   * strings; fingerprint collisions (~n²/2⁶⁴) are the standard
   * accepted error of this family. Scale shape mirrors segmentDedup:
   * explode → groupBy(hash) min-struct partial agg (one row per
   * distinct window crosses the shuffle) → equi-join back → per-doc
   * rollup; everything keyed, no pairwise comparison. Documents
   * shorter than `winLen` have no windows and are absent from the
   * output (nothing to span-match).
   */
  def duplicateSpans(df: DataFrame, id: Column, text: Column,
      winLen: Int): DataFrame =
    duplicateSpansFromWindows(spanWindows(df, id, text, winLen))

  /** (doc, pos, h): every stride-1 `winLen`-token window of every
    * document, as an 8-byte fingerprint — the frame both sides of the
    * [[duplicateSpans]] self-comparison consume. */
  def spanWindows(df: DataFrame, id: Column, text: Column,
      winLen: Int): DataFrame =
    df.select(id.as("doc"), Text.tokens(text).as("w"))
      .select(col("doc"),
        posexplode(Text.shinglesOf(col("w"), winLen)).as(Seq("pos", "win")))
      .select(col("doc"), col("pos"), Portable.hash64(col("win")).as("h"))

  /**
   * [[duplicateSpans]] with the exploded window frame materialized
   * ONCE: `wins` feeds both the first-occurrence aggregate and the
   * join-back, so handing it in as a lazy plan runs the corpus
   * tokenize + shingle + explode twice per call — the widest scan in
   * a dedup suite, paid double. Callers that can afford scratch space
   * spill the 20-byte (doc, pos, h) frame to parquet (see the
   * DataOpsQueries span-spill scope) and pass the read-back here;
   * both consumers then scan the cheap columnar frame.
   */
  def duplicateSpansFromWindows(wins: DataFrame): DataFrame = {
    val first = wins.groupBy(col("h"))
      .agg(min(struct(col("doc"), col("pos"))).as("first"))
    wins.join(first, Seq("h"))
      .withColumn("is_dup",
        (col("doc") =!= col("first.doc") ||
          col("pos") =!= col("first.pos")).cast("long"))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum(col("is_dup")).as("n_dup_windows"))
      .withColumn("dup_win_frac",
        round(col("n_dup_windows").cast("double") /
          col("n_windows").cast("double"), 6))
  }

  /**
   * Per-document window novelty — the memorization-risk metric of
   * [[duplicateSpans]]: for each doc, the fraction of its DISTINCT
   * `winLen`-token windows that appear in at least one OTHER document
   * (novelty = 1 − shared fraction). d23 counts every duplicated
   * occurrence (including intra-doc repeats) to find spans to cut;
   * this scores cross-doc overlap per doc, the signal used to
   * down-weight or audit documents a model could memorize from many
   * sources.
   *
   * Scale shape: distinct windows per doc (array_distinct, per-row),
   * hashed to 8-byte fingerprints before the shuffle; one groupBy(h)
   * counting distinct docs; equi-join back; keyed per-doc rollup.
   * Same accepted ~n²/2⁶⁴ fingerprint-collision error as d23. Docs
   * shorter than `winLen` have no windows and are absent.
   */
  def windowNovelty(df: DataFrame, id: Column, text: Column,
      winLen: Int): DataFrame =
    windowNoveltyFromWindows(noveltyWindows(df, id, text, winLen))

  /** (doc, h): each document's DISTINCT `winLen`-token windows as
    * 8-byte fingerprints — the frame both the per-window doc count and
    * the join-back of [[windowNovelty]] consume. */
  def noveltyWindows(df: DataFrame, id: Column, text: Column,
      winLen: Int): DataFrame =
    df.select(id.as("doc"), Text.tokens(text).as("w"))
      .select(col("doc"),
        explode(Text.shingleSetOf(col("w"), winLen)).as("win"))
      .select(col("doc"), Portable.hash64(col("win")).as("h"))

  /**
   * [[windowNovelty]] with the window frame materialized ONCE — same
   * double-scan rationale as [[duplicateSpansFromWindows]]: the
   * (doc, h) frame feeds both the groupBy(h) doc count and the
   * join-back, and as a lazy plan the corpus's widest scan
   * (tokenize + shingle + explode + array_distinct) ran twice per
   * call. Spill the 16-byte frame and pass the read-back.
   */
  def windowNoveltyFromWindows(wins: DataFrame): DataFrame = {
    val docsPerWin = wins.groupBy(col("h"))
      .agg(countDistinct(col("doc")).as("nd"))
    wins.join(docsPerWin, Seq("h"))
      .groupBy(col("doc").as("doc_id"))
      .agg(count(lit(1)).as("n_windows"),
        sum((col("nd") > 1).cast("long")).as("n_shared_windows"))
      .withColumn("novelty",
        round(lit(1.0) - col("n_shared_windows").cast("double") /
          col("n_windows").cast("double"), 6))
  }

  /**
   * Exact n-gram Jaccard pairs >= threshold, via distinct-shingle
   * self-join (ground truth for small corpora; at scale use
   * [[jaccardOnCandidates]]).
   */
  def jaccardPairs(df: DataFrame, id: Column, text: Column,
      shingleN: Int, threshold: Double): DataFrame = {
    val sh = explodedShingles(df, id, text, shingleN)
    val sizes = sh.groupBy(col("doc")).agg(count(lit(1)).as("n"))
    val inter = sh.as("a").join(sh.as("b"),
        col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("inter"))
    inter
      .join(sizes.withColumnRenamed("doc", "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed("doc", "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard",
        col("inter").cast("double") / (col("na") + col("nb") - col("inter")).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
  }
}
