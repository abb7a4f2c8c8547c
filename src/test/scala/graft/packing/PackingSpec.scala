package graft.packing

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PackingSpec extends SparkTestBase {
  import spark.implicits._

  test("packSequences lays documents head-to-tail across sequence boundaries") {
    // budget 10: doc 0 (7 tok) → seq 0 off 0; doc 1 (6 tok) spans seq
    // 0→1; doc 2 (10 tok) spans 1→2; doc 3 (0 tok) sits AT offset 3 of
    // seq 2 occupying nothing; doc 4 (3 tok) follows at the same spot.
    val docs = Seq((0L, 7L), (1L, 6L), (2L, 10L), (3L, 0L), (4L, 3L))
      .toDF("doc_id", "n")
    // bucketSize 2 forces multiple buckets so the two-phase offsets
    // are actually exercised, not degenerate in one bucket.
    val out = Packing.packSequences(docs, col("doc_id"), col("n"),
        budget = 10, bucketSize = 2L)
      .orderBy("doc_id")
      .select("doc_id", "tok_start", "seq_start", "off_start", "seq_end", "n_seqs")
      .as[(Long, Long, Long, Long, Long, Long)].collect().toSeq
    assert(out === Seq(
      (0L, 0L, 0L, 0L, 0L, 1L),
      (1L, 7L, 0L, 7L, 1L, 2L),
      (2L, 13L, 1L, 3L, 2L, 2L),
      (3L, 23L, 2L, 3L, 2L, 1L),
      (4L, 23L, 2L, 3L, 2L, 1L)))
  }

  test("packSequences is invariant to bucket size") {
    val docs = (0L until 100L).map(i => (i, i % 7)).toDF("doc_id", "n")
    def run(b: Long) = Packing.packSequences(docs, col("doc_id"), col("n"),
        budget = 16, bucketSize = b)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(run(3L) === run(1000L))
  }

  test("shuffleShards is deterministic per seed and contiguous per shard") {
    val docs = (0L until 200L).map(Tuple1(_)).toDF("doc_id")
    val a = Packing.shuffleShards(docs, col("doc_id"), "s1", nShards = 8)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    val b = Packing.shuffleShards(docs, col("doc_id"), "s1", nShards = 8)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a === b, "same seed must reproduce the same order")
    val c = Packing.shuffleShards(docs, col("doc_id"), "s2", nShards = 8)
      .orderBy("doc_id").collect().toSeq.map(_.toSeq)
    assert(a !== c, "a different seed must permute differently")
    // every shard's positions are exactly 1..|shard|
    val byShard = Packing.shuffleShards(docs, col("doc_id"), "s1", nShards = 8)
      .groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"), max("pos").as("hi"))
      .select("n", "lo", "hi")
      .as[(Long, Long, Long)].collect()
    byShard.foreach { case (n, lo, hi) =>
      assert(lo == 1L && hi == n, s"positions must be dense 1..$n, got [$lo,$hi]")
    }
  }

  test("length buckets bin by exact power-of-two edges and fill batches densely") {
    // n_tokens 1→bucket 0, 2,3→1, 4..7→2, 8→3; 0 clamps to bucket 0
    val docs = Seq((1L, 1L), (2L, 2L), (3L, 3L), (4L, 4L), (5L, 7L),
      (6L, 8L), (7L, 0L)).toDF("doc_id", "n")
    val got = Packing.lengthBuckets(docs, col("doc_id"), col("n"), batchSize = 2)
      .select("doc_id", "bucket", "batch_id", "pos_in_batch")
      .as[(Long, Long, Long, Long)].collect().map(r => r._1 -> (r._2, r._3, r._4))
      .toMap
    assert(got(1L)._1 == 0L && got(7L)._1 == 0L)
    assert(got(2L)._1 == 1L && got(3L)._1 == 1L)
    assert(got(4L)._1 == 2L && got(5L)._1 == 2L)
    assert(got(6L)._1 == 3L)
    // bucket 0 holds docs 1 and 7 → one batch, positions 0 and 1
    assert(Set(got(1L), got(7L)) == Set((0L, 0L, 0L), (0L, 0L, 1L)))
  }

  test("padding audit charges each batch exactly its dynamic-pad waste") {
    // bucket 2 (lengths 4..7) gets docs of 4 and 7 tokens in one
    // batch: pad target 7, mass 11, waste 2·7 − 11 = 3 (frac 3/14).
    val docs = Seq((1L, 4L), (2L, 7L), (3L, 8L)).toDF("doc_id", "n")
    val got = Packing.paddingEfficiency(
        Packing.lengthBuckets(docs, col("doc_id"), col("n"), batchSize = 2))
      .select("bucket", "n_docs", "pad_to", "batch_tokens", "pad_tokens",
        "pad_frac")
      .as[(Long, Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(2L) == ((2L, 2L, 7L, 11L, 3L,
      BigDecimal(3.0 / 14.0).setScale(6, BigDecimal.RoundingMode.HALF_UP)
        .toDouble)))
    // the singleton batch in bucket 3 pads nothing
    assert(got(3L)._5 == 0L && got(3L)._6 == 0.0)
  }
}
