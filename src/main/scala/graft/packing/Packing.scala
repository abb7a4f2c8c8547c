package graft.packing

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Training-sequence assembly operators: concat-then-chunk sequence
 * packing and deterministic corpus shuffling — the last two steps a
 * curated corpus goes through before it becomes model input.
 */
object Packing {

  /**
   * Concat-then-chunk sequence packing: documents, taken in `id`
   * order, are conceptually concatenated into one token stream and cut
   * into fixed-`budget` training sequences (the GPT-style packing that
   * wastes zero tokens to padding; documents may span sequence
   * boundaries). Emits each document's span in sequence space:
   * global token offset, (sequence, offset) of its first token, and
   * the last sequence it touches.
   *
   * Scale shape: the naive form is one global running sum —
   * `Window.orderBy(id)` with no partition key, which Spark executes
   * on a SINGLE partition (the well-known scale killer). This is the
   * two-phase distributed prefix sum instead: per-bucket token totals
   * (partial-agg groupBy, one row per `bucketSize` docs), a running
   * sum over that tiny per-bucket frame (single-partition but only
   * |docs|/bucketSize rows — ~25k rows for 100M docs at the default),
   * broadcast back, and an intra-bucket window partitioned by bucket.
   * No stage ever holds more than a bucket of raw rows in one task.
   */
  def packSequences(df: DataFrame, id: Column, tokenCount: Column,
      budget: Int, bucketSize: Long = 4096L): DataFrame = {
    val base = df.select(id.as("doc_id"), tokenCount.cast("long").as("n_tokens"))
    val bucketed = base.withColumn("bucket", expr(s"doc_id div $bucketSize"))
    val perBucket = bucketed.groupBy("bucket")
      .agg(sum("n_tokens").as("bucket_tokens"))
    val wBuckets = Window.orderBy("bucket")
      .rowsBetween(Window.unboundedPreceding, -1)
    val offsets = perBucket
      .withColumn("bucket_start",
        coalesce(sum("bucket_tokens").over(wBuckets), lit(0L)))
      .select("bucket", "bucket_start")
    val wInBucket = Window.partitionBy("bucket").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    bucketed.join(broadcast(offsets), Seq("bucket"))
      .withColumn("tok_start",
        col("bucket_start") + coalesce(sum("n_tokens").over(wInBucket), lit(0L)))
      // An empty document occupies zero tokens but still needs a
      // well-defined location: greatest(n,1) pins seq_end = seq_start.
      .withColumn("seq_start", expr(s"tok_start div $budget"))
      .withColumn("off_start", pmod(col("tok_start"), lit(budget.toLong)))
      .withColumn("seq_end",
        expr(s"(tok_start + greatest(n_tokens, 1) - 1) div $budget"))
      .withColumn("n_seqs", col("seq_end") - col("seq_start") + lit(1L))
      .select("doc_id", "n_tokens", "tok_start", "seq_start", "off_start",
        "seq_end", "n_seqs")
  }

  /**
   * Length-bucketed batch assignment: documents are binned by
   * power-of-two token length (bucket = ⌊log₂ n⌋ via integer bit
   * length — no float log, so the bin edge is exact in any engine) and
   * packed into fixed-size training batches within their bucket — the
   * standard padding-efficiency trick when sequences are NOT
   * concat-packed (batching like-length docs minimizes pad tokens).
   *
   * Scale shape: one narrow projection plus a window partitioned by
   * bucket; parallelism = number of occupied buckets × AQE splits.
   * A skew-heavy corpus concentrates in few buckets — if that bites,
   * sub-shard the window key by `doc_id div N` and renumber, the same
   * two-phase trick [[packSequences]] uses.
   */
  def lengthBuckets(df: DataFrame, id: Column, tokenCount: Column,
      batchSize: Int): DataFrame = {
    val base = df.select(id.as("doc_id"), tokenCount.cast("long").as("n_tokens"))
      // floor(log2(n)) = bit-length(n) - 1, exact integer arithmetic
      .withColumn("bucket",
        (length(bin(greatest(col("n_tokens"), lit(1L)))) - 1).cast("long"))
    val w = Window.partitionBy("bucket").orderBy("doc_id")
    base.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("batch_id", expr(s"(rn - 1) div $batchSize"))
      .withColumn("pos_in_batch", pmod(col("rn") - 1L, lit(batchSize.toLong)))
      .select("doc_id", "n_tokens", "bucket", "batch_id", "pos_in_batch")
  }

  /**
   * Padding-efficiency audit of [[lengthBuckets]]: per training
   * batch, the pad target (the batch's longest document — dynamic
   * padding), the real token mass, and the padded-token fraction the
   * batch would burn — the measurement that accepts or rejects a
   * bucketing configuration before a training run spends GPU-hours on
   * pad tokens. Low `pad_frac` across batches is the whole point of
   * p03's power-of-two bins; this query is the proof.
   *
   * Scale shape: one partial-agg groupBy(bucket, batch_id) over the
   * [[lengthBuckets]] projection — exact integer arithmetic until the
   * final division, nothing beyond p03's own per-bucket window.
   */
  def paddingEfficiency(buckets: DataFrame): DataFrame =
    buckets.groupBy(col("bucket"), col("batch_id"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tokens")).as("pad_to"),
        sum(col("n_tokens")).as("batch_tokens"))
      .withColumn("pad_tokens",
        col("n_docs") * col("pad_to") - col("batch_tokens"))
      .withColumn("pad_frac",
        round(col("pad_tokens").cast("double") /
          (col("n_docs") * col("pad_to")).cast("double"), 6))

  /**
   * Deterministic sharded corpus shuffle: every document gets a
   * portable pseudo-random key from (seed, id), a shard by key mod
   * `nShards`, and a position within its shard — the reproducible
   * "global shuffle" a training run needs (same seed → same order,
   * any cluster size).
   *
   * Scale shape: the one thing this deliberately does NOT produce is
   * a single global rank — that would be an unpartitioned window. A
   * sharded (shard, pos) order is equivalent for training (readers
   * interleave shards) and every step here is partitioned: the window
   * runs per shard, so parallelism = nShards. Size nShards to the
   * corpus (e.g. 10k shards at 100 TB).
   */
  def shuffleShards(df: DataFrame, id: Column, seed: String,
      nShards: Int): DataFrame = {
    val keyed = df.select(id.as("doc_id"))
      .withColumn("skey", Portable.hash64(
        concat(lit(seed), lit(":"), col("doc_id").cast("string"))))
      .withColumn("shard", pmod(col("skey"), lit(nShards.toLong)))
    val w = Window.partitionBy("shard").orderBy(col("skey"), col("doc_id"))
    keyed
      .withColumn("pos", row_number().over(w).cast("long"))
      .select("doc_id", "shard", "pos")
  }
}
