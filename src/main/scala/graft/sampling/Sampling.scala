package graft.sampling

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Corpus-sampling operators for training-data curation at 100 TB:
 * deterministic stratified sampling and domain-mixture weighting.
 *
 * Both are built on the portable md5-derived hash ([[Portable.hash64]])
 * instead of RNG so the sample is (a) reproducible run-over-run,
 * (b) stable under corpus growth — adding documents never flips the
 * keep/drop decision of an existing document — and (c) verifiable
 * bit-for-bit by an external SQL oracle. This mirrors how production
 * pipelines pin sampling to a content/id hash rather than `rand()`
 * (which reshuffles on every retry and breaks exactly-once semantics
 * under Spark task replay).
 */
object Sampling {

  /**
   * Deterministic per-stratum sampling rate in percent, derived from
   * the stratum key itself: 10 + hash(stratum) mod 81 ∈ [10, 90].
   * A real deployment passes explicit rates; deriving them from the
   * key keeps the gate self-contained while exercising the same code
   * path (a per-stratum rate looked up per row with no shuffle).
   */
  def derivedRatePct(stratum: Column): Column =
    lit(10L) + pmod(Portable.hash64(stratum), lit(81L))

  /**
   * Deterministic stratified sample: keep a row iff
   * `hash(stratum ':' id) mod 100 < ratePct(stratum)`.
   *
   * Scale shape: a single narrow filter — no shuffle, no per-stratum
   * groupBy, fully codegen'd; the per-stratum rate is an expression of
   * the row itself, so 1000 executors sample independently and the
   * union is exactly the global sample.
   */
  def stratifiedSample(df: DataFrame, stratum: Column, id: Column,
      ratePct: Column): DataFrame = {
    val key = concat(stratum.cast("string"), lit(":"), id.cast("string"))
    df.withColumn("rate_pct", ratePct)
      .filter(pmod(Portable.hash64(key), lit(100L)) < col("rate_pct"))
  }

  /** [[stratifiedSample]] with the self-derived per-stratum rate. */
  def stratifiedSampleDerived(df: DataFrame, stratum: Column,
      id: Column): DataFrame =
    stratifiedSample(df, stratum, id, derivedRatePct(stratum))

  /**
   * Per-stratum quota cap: keep AT MOST `quota` rows per stratum,
   * chosen deterministically by portable-hash order — the "no single
   * domain may contribute more than N documents" rule of a curation
   * recipe, where rate-based sampling can't bound the absolute count.
   *
   * Scale shape: rank-within-stratum then filter rank <= quota. Spark
   * rewrites that pattern into a WindowGroupLimit: each map task keeps
   * only its local top-`quota` per stratum BEFORE the shuffle, so the
   * exchange carries O(strata × quota) rows per task, not the corpus
   * (asserted in PlanSpec).
   */
  def quotaSample(df: DataFrame, stratum: Column, id: Column,
      quota: Int): DataFrame = {
    val key = Portable.hash64(
      concat(stratum.cast("string"), lit(":"), id.cast("string")))
    df.withColumn("__qkey", key)
      .withColumn("q_rank", row_number().over(
        Window.partitionBy(stratum).orderBy(col("__qkey"), id)).cast("long"))
      .filter(col("q_rank") <= quota)
      .drop("__qkey")
  }

  /**
   * Domain-mixture weights: per stratum (source/domain), the token
   * share of the corpus and the up/down-sampling weight that would
   * equalize the mixture to a uniform target, with a capped integer
   * repeat factor (the "epochs over this domain" knob of a
   * training-data recipe).
   *
   * Scale shape: one partial-agg groupBy(stratum) over the corpus; the
   * global totals run as a window over the tiny aggregated frame (one
   * row per domain), never over the raw data.
   */
  def mixtureWeights(df: DataFrame, stratum: Column,
      tokenCount: Column, maxRepeat: Int = 5): DataFrame = {
    val per = df.groupBy(stratum.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
    val all = Window.partitionBy(lit(1))
    per
      .withColumn("total_tokens", sum(col("n_tokens")).over(all))
      .withColumn("n_strata", count(lit(1)).over(all))
      .select(
        col("source"), col("n_docs"), col("n_tokens"),
        round(col("n_tokens").cast("double") /
          col("total_tokens").cast("double"), 6).as("token_frac"),
        // nullif guards the zero-token stratum: Spark would yield
        // Infinity where the SQL oracle's division-by-zero differs;
        // NULL round-trips identically through both.
        round(col("total_tokens").cast("double") /
          (col("n_strata").cast("double") *
            nullif(col("n_tokens"), lit(0L)).cast("double")),
          6).as("mix_weight"))
      .withColumn("repeat_factor",
        least(ceil(col("mix_weight")), lit(maxRepeat.toLong)).cast("long"))
  }

  /**
   * Temperature-scaled domain mixture — the standard rebalancing knob
   * of multilingual / multi-source training recipes: the target share
   * of stratum `s` is `p_s^α / Σ_t p_t^α` where `p_s` is its observed
   * token share, so `α = 1` keeps the natural mixture, `α → 0`
   * approaches uniform, and `α ∈ (0, 1)` upsamples the tail without
   * flattening the head. Returns per source the observed share, the
   * tempered target share, and the sampling weight `q_s / p_s` that
   * realizes it (feed to [[applyMixture]] as `mix_weight`).
   *
   * Determinism across engines: `α = 0.5` (the default, and the most
   * common setting) is computed with `sqrt`, which IEEE 754 requires
   * to be correctly rounded — bit-identical in any engine. Other α go
   * through `pow`, which carries no such guarantee; verify before
   * gating on one. The Σ p^α denominator is a sequential fold in
   * stratum order (not a float sum in engine-chosen order), so the
   * accumulation order — and therefore the last ulp — is pinned.
   *
   * Scale shape: one partial-agg groupBy(stratum) over the corpus;
   * the totals and the fold run over the tiny per-source frame (one
   * row per domain) and broadcast back.
   */
  def temperatureMixture(df: DataFrame, stratum: Column, tokenCount: Column,
      alpha: Double = 0.5): DataFrame = {
    val temper = (p: Column) =>
      if (alpha == 0.5) sqrt(p) else pow(p, lit(alpha))
    val per = df.groupBy(stratum.as("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(tokenCount.cast("long")).as("n_tokens"))
    // Long total: exact in any summation order.
    val withP = per
      .withColumn("token_frac", col("n_tokens").cast("double") /
        sum(col("n_tokens")).over(Window.partitionBy(lit(1))).cast("double"))
      .withColumn("pa", temper(col("token_frac")))
    // Double total: order-pinned sequential fold over (source, pa).
    val sumPa = withP.groupBy(lit(1).as("g"))
      .agg(aggregate(array_sort(collect_list(struct(col("source"), col("pa")))),
        lit(0.0), (acc, x) => acc + x.getField("pa")).as("sum_pa"))
    withP.join(broadcast(sumPa.drop("g")))
      .withColumn("temp_frac", col("pa") / col("sum_pa"))
      .select(col("source"), col("n_docs"), col("n_tokens"),
        round(col("token_frac"), 6).as("token_frac"),
        round(col("temp_frac"), 6).as("temp_frac"),
        // nullif: a zero-token stratum has p = 0 → weight NULL (not a
        // 0/0 NaN that differs across engines).
        round(col("temp_frac") / nullif(col("token_frac"), lit(0.0)), 6)
          .as("sample_weight"))
  }

  /**
   * Materialize a domain mixture: turn [[mixtureWeights]]' per-source
   * weight into the actual resampled corpus — `floor(w)` full copies
   * of every doc plus one extra copy for a deterministic hash-fraction
   * `w − floor(w)` of docs. A source with weight 2.3 emits every doc
   * 2× and 30% of its docs 3×; a downweighted source at 0.4 keeps 40%
   * of its docs. This is the epoch-repeat step a mixture-trained run
   * actually performs, made reproducible: no RNG, stable under corpus
   * growth and task replay. Weights cap at `maxRepeat` (matching
   * repeat_factor); a NULL weight (zero-token stratum) drops the
   * source.
   *
   * Scale shape: the weight table is one row per source (broadcast
   * equi-join); copies materialize by exploding a per-row sequence —
   * a projection, no shuffle beyond the weight join.
   */
  def applyMixture(df: DataFrame, id: Column, stratum: Column,
      weights: DataFrame, maxRepeat: Int = 5): DataFrame =
    df.select(id.as("doc_id"), stratum.as("source"))
      .join(broadcast(weights.select(col("source"), col("mix_weight"))
        .filter(col("mix_weight").isNotNull)), Seq("source"))
      .withColumn("eff", least(col("mix_weight"), lit(maxRepeat.toDouble)))
      .withColumn("hpct", pmod(Portable.hash64(
        concat(lit("mix:"), col("doc_id").cast("string"))),
        lit(1000000L)).cast("double"))
      .withColumn("copies", floor(col("eff")) +
        when(col("hpct") < (col("eff") - floor(col("eff"))) * 1000000.0, 1L)
          .otherwise(0L))
      .filter(col("copies") > 0)
      .select(col("doc_id"), col("source"),
        explode(sequence(lit(1L), col("copies"))).as("copy"))

  /**
   * DSIR-style importance weighting (Xie et al. 2023, "Data Selection
   * for Language Models via Importance Resampling"): score every raw
   * document by how target-like its hashed n-gram feature distribution
   * is. Features are unigrams hashed into `buckets` cells; the weight
   * of a document is `Σ_tokens log( p_target(bucket) / p_raw(bucket) )`
   * with add-one smoothing on both distributions. High-weight raw
   * documents are the ones importance resampling keeps.
   *
   * Engine-portable determinism: the per-bucket log-ratio is floored
   * to integer micro-nats BEFORE the per-document sum, so the
   * accumulation is exact 64-bit integer arithmetic in any engine and
   * any order — no float-summation-order hazard. (The bucket count is
   * per-document grouped first, so the sum has one term per distinct
   * bucket, but the quantization is what makes the gate hashable.)
   *
   * Scale shape: both distributions are `buckets`-row partial aggs
   * (map-side combine collapses each task's token stream to ≤`buckets`
   * rows); the ratio table broadcasts back onto the per-doc bucket
   * counts — no shuffle ever carries raw tokens beyond the one
   * (doc, bucket) partial agg. The target corpus is typically ≪ raw;
   * both sides stream once.
   */
  def dsirWeights(raw: DataFrame, target: DataFrame, id: Column,
      text: Column, buckets: Int = 64): DataFrame = {
    def bucketCounts(df: DataFrame): DataFrame =
      df.select(explode(graft.text.Text.tokens(text)).as("t"))
        .select(pmod(Portable.hash64(col("t")), lit(buckets.toLong)).as("b"))
        .groupBy(col("b")).agg(count(lit(1)).as("n"))
    // Dense bucket axis: a bucket unseen in either corpus still gets
    // its smoothed mass (cf. the CMS left-join fix in Sketch.scala).
    val axis = raw.sparkSession.range(buckets).select(col("id").as("b"))
    def smoothed(counts: DataFrame, nCol: String): DataFrame =
      axis.join(counts, Seq("b"), "left")
        .select(col("b"), coalesce(col("n"), lit(0L)).as(nCol))
    val tgt = smoothed(bucketCounts(target), "n_t")
    val rw = smoothed(bucketCounts(raw), "n_r")
    val joined = tgt.join(rw, Seq("b"))
    // Totals via a 1-row aggregate cross-joined back (the 64-row frame
    // never moves to a single-partition global window).
    val totals = joined.agg(sum(col("n_t")).as("t_total"),
      sum(col("n_r")).as("r_total"))
    // One ln, not two: the log-ratio collapses to
    //   ln( ((n_t+1)·(r_total+64)) / ((n_r+1)·(t_total+64)) )
    // where both products and the division are IEEE-correctly-rounded
    // double ops on integer-valued operands — bit-identical in every
    // engine — so the only libm call left is a single ln of the SAME
    // double on both sides (the two-ln form fed each engine different
    // intermediate roundings, doubling the chance a micro-nat floor
    // boundary falls inside the ulp gap). Residual tolerance: ln is
    // ~1-ulp accurate, so a ratio within ~1e-10 of an exact e^(m/1e6)
    // boundary could still floor differently across libms — accepted
    // and documented, same class as the round(..,6) oracles.
    val ratios = joined.crossJoin(totals)
      .select(col("b"),
        floor(log(
          ((col("n_t") + 1).cast("double") *
            (col("r_total") + buckets).cast("double")) /
          ((col("n_r") + 1).cast("double") *
            (col("t_total") + buckets).cast("double"))) * 1e6)
          .cast("long").as("lr_micro"))
    val docBuckets = raw
      .select(id.as("doc_id"), explode(graft.text.Text.tokens(text)).as("t"))
      .select(col("doc_id"),
        pmod(Portable.hash64(col("t")), lit(buckets.toLong)).as("b"))
      .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
    docBuckets.join(broadcast(ratios), Seq("b"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(col("c") * col("lr_micro")).as("weight_micro"))
  }
}
