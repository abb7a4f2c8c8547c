package graft.ann

import graft.SparkTestBase

class AnnSpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f)),
    (1L, Array(0.9f, 0.1f, 0.0f)),  // closest to 0
    (2L, Array(0.0f, 1.0f, 0.0f)),  // orthogonal to 0
    (3L, Array(0.0f, 0.0f, 1.0f)),
    (4L, Array(0.7f, 0.7f, 0.0f))
  ).toDF("vec_id", "embedding")

  test("brute-force top-k returns exact cosine ranking") {
    val got = Ann.bruteForceTopK(vecs.filter($"vec_id" === 0L), vecs, k = 2)
      .orderBy($"rank")
      .select($"cand_id", $"cos").as[(Long, Double)].collect()
    assert(got.map(_._1).toSeq == Seq(1L, 4L))
    assert(got(0)._2 > 0.99)
    assert(got(1)._2 > 0.70 && got(1)._2 < 0.72) // cos(45°)
  }

  test("ivf nprobe=2 recall dominates nprobe=1 against the brute-force truth") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${sf("0.001")}/embeddings.parquet")
    val probes = emb.filter(col("vec_id") < 10)
    def hits(nprobe: Int): Long =
      Ann.ivfTopK(probes, emb, nList = 8, k = 3, nprobe = nprobe)
        .select("query_id", "cand_id")
        .intersect(Ann.bruteForceTopK(probes, emb, k = 3)
          .select("query_id", "cand_id"))
        .count()
    val n1 = hits(1)
    val n2 = hits(2)
    assert(n2 >= n1, s"widening the probe set must not lose recall ($n1 -> $n2)")
    // probing a second cell must actually add comparisons per query
    val counted = Ann.ivfTopK(probes, emb, nList = 8, k = 3, nprobe = 2)
      .groupBy("query_id").count()
    assert(counted.agg(min("count")).head().getLong(0) >= 1L)
  }

  test("cosinePairs finds only the high-similarity pairs") {
    val got = Ann.cosinePairs(vecs, threshold = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 1L)))
  }

  test("codegen LshBucket matches the interpreted column formulation bit-for-bit") {
    import org.apache.spark.sql.functions._
    val emb = spark.read.parquet(s"${sf("0.001")}/embeddings.parquet")
      .select(col("vec_id"), Ann.toDouble(col("embedding")).as("v"))
    for (nBits <- Seq(4, 7)) {
      val mismatches = emb
        .select(Ann.lshBucket(col("v"), nBits).as("fast"),
          Ann.lshBucketColumns(col("v"), nBits).as("ref"))
        .filter(col("fast") =!= col("ref")).count()
      assert(mismatches == 0L, s"nBits=$nBits: $mismatches rows differ")
    }
  }

  test("recallAtK scores retrieved vs truth per query") {
    import org.apache.spark.sql.functions._
    val truth = Seq((1L, 10L), (1L, 11L), (1L, 12L), (2L, 20L), (2L, 21L))
      .toDF("query_id", "cand_id")
    val retrieved = Seq((1L, 10L), (1L, 12L), (1L, 99L), (2L, 7L))
      .toDF("query_id", "cand_id")
    val got = Ann.recallAtK(truth, retrieved)
      .select($"query_id", $"n_true", $"n_hit", $"recall")
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1).toSeq
    // q1: 2 of 3 truth hits (the extra retrieved 99 never counts);
    // q2: 0 of 2.
    assert(got == Seq((1L, 3L, 2L, 0.666667), (2L, 2L, 0L, 0.0)))
  }

  test("lsh recall on the corpus is perfect when LSH finds the true top-k") {
    val emb = spark.read.parquet(s"${sf("0.001")}/embeddings.parquet")
    val probes = emb.filter($"vec_id" < 5)
    val r = Ann.recallAtK(
      Ann.bruteForceTopK(probes, emb, k = 3),
      Ann.lshTopK(probes, emb, nBits = 4, k = 3))
      .select($"recall").as[Double].collect()
    // recall is a fraction; the LSH index may miss cross-bucket
    // neighbors but never reports negative or >1
    assert(r.nonEmpty && r.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("centroid outlier scores cosine to the label's mean vector") {
    // label 1: (1,0) and (0,1) → centroid (0.5, 0.5); each member's
    // cosine to it is 1/√2. label 2: single vector → cosine 1.
    val df = Seq(
      (0L, Array(1.0f, 0.0f), 1),
      (1L, Array(0.0f, 1.0f), 1),
      (2L, Array(3.0f, 4.0f), 2)).toDF("vec_id", "embedding", "label")
    val got = Ann.centroidOutlier(df)
      .select($"vec_id", $"centroid_cos").as[(Long, Double)].collect().toMap
    assert(got(0L) == math.floor(1e6 / math.sqrt(2)) / 1e6 ||
      math.abs(got(0L) - 1 / math.sqrt(2)) < 1e-6)
    assert(got(0L) == got(1L))
    assert(got(2L) == 1.0)
  }

  test("kmeans separates two obvious clusters and assigns every vector once") {
    // two tight groups on orthogonal axes; init centroids (ids 0,1)
    // land one in each group, so even one iteration separates them.
    val df = Seq(
      (0L, Array(10.0f, 0.0f)), (2L, Array(11.0f, 1.0f)),
      (3L, Array(9.0f, -1.0f)),
      (1L, Array(0.0f, 10.0f)), (4L, Array(1.0f, 11.0f)),
      (5L, Array(-1.0f, 9.0f))).toDF("vec_id", "embedding")
    val got = Ann.kmeans(df, k = 2, iters = 2)
      .as[(Long, Int)].collect().toMap
    assert(got.size == 6, "every vector assigned exactly once")
    assert(got.values.forall(c => c == 0 || c == 1))
    assert(Set(got(0L), got(2L), got(3L)).size == 1, "x-axis group together")
    assert(Set(got(1L), got(4L), got(5L)).size == 1, "y-axis group together")
    assert(got(0L) != got(1L), "the two groups are distinct clusters")
  }

  test("semDedupPairs finds same-cluster near-dups and never crosses clusters") {
    // ids 0,1 are the init centroids (x-axis vs y-axis group); 2 is a
    // near-copy of 0, 4 a near-copy of 1; 0↔1 are orthogonal.
    val df = Seq(
      (0L, Array(10.0f, 0.0f)), (2L, Array(10.0f, 0.5f)),
      (1L, Array(0.0f, 10.0f)), (4L, Array(0.5f, 10.0f)))
      .toDF("vec_id", "embedding")
    val got = Ann.semDedupPairs(df, k = 2, iters = 2, threshold = 0.9)
      .select($"id_a", $"id_b").as[(Long, Long)].collect().toSet
    assert(got == Set((0L, 2L), (1L, 4L)),
      s"expected within-cluster near-dup pairs only, got $got")
  }

  test("pqCodes assigns each subvector to its nearest codeword") {
    // 4-dim vectors, m=2 subspaces of 2 dims, k=2 codewords (ids 0,1).
    // vec 2 copies vec 0's first half and vec 1's second half.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 5.0f, 5.0f)),
      (1L, Array(9.0f, 9.0f, 0.0f, 1.0f)),
      (2L, Array(1.0f, 0.1f, 0.0f, 0.9f))).toDF("vec_id", "embedding")
    val got = Ann.pqCodes(df, m = 2, k = 2)
      .as[(Long, Long, Int)].collect()
      .map { case (id, sub, code) => (id, sub) -> code }.toMap
    assert(got.size == 6, "every (vector, subspace) coded exactly once")
    assert(got((2L, 0L)) == 0, "first half nearest codeword 0")
    assert(got((2L, 1L)) == 1, "second half nearest codeword 1")
    assert(got((0L, 0L)) == 0 && got((1L, 0L)) == 1,
      "codebook vectors code to themselves")
  }

  test("ivfPqTopK: ADC equals the exact inner product under self-codewords") {
    import org.apache.spark.sql.functions.col
    // Integer-valued vectors (every per-subspace partial is exact) and
    // kCode = |corpus| (every vector is its own codeword), so the ADC
    // fold must reproduce the exact inner product and its ranking.
    val df = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(2.0f, 1.0f, 0.0f, 0.0f)), // dot with 0 = 2
      (2L, Array(0.0f, 0.0f, 3.0f, 1.0f)), // dot with 0 = 0
      (3L, Array(1.0f, 1.0f, 1.0f, 1.0f))  // dot with 0 = 1
    ).toDF("vec_id", "embedding")
    val cents = Seq((0, Array(1.0, 1.0, 1.0, 1.0))).toDF("cent_id", "ce")
    val got = Ann.ivfPqTopK(cents, df.filter(col("vec_id") === 0L), df,
        m = 2, kCode = 4, k = 3, nprobe = 1)
      .orderBy(col("rank"))
      .select(col("cand_id"), col("rank"), col("adc_dot"))
      .as[(Long, Int, Double)].collect().toSeq
    assert(got == Seq((1L, 1, 2.0), (3L, 2, 1.0), (2L, 3, 0.0)))
  }

  test("pqTrainCodebook refits each codeword to its assigned subvector mean") {
    // m=1, k=2: init codewords are vecs 0 ([0,0]) and 1 ([4,4]).
    // Vec 2 assigns to code 0, vec 3 to code 1, so one refit moves the
    // codewords to the member means [0,1] and [4,5].
    val df = Seq(
      (0L, Array(0.0f, 0.0f)),
      (1L, Array(4.0f, 4.0f)),
      (2L, Array(0.0f, 2.0f)),
      (3L, Array(4.0f, 6.0f))).toDF("vec_id", "embedding")
    val cb = Ann.pqTrainCodebook(Ann.pqSubvectors(df, m = 1), k = 2)
      .as[(Long, Int, Array[Double])].collect()
      .map { case (sub, code, cv) => (sub, code) -> cv.toSeq }.toMap
    assert(cb((0L, 0)) == Seq(0.0, 1.0))
    assert(cb((0L, 1)) == Seq(4.0, 5.0))
  }

  test("lsh bucket is deterministic and identical vectors share a bucket") {
    val dup = Seq((10L, Array(1.0f, 0.0f, 0.0f))).toDF("vec_id", "embedding")
    val all = vecs.union(dup)
    val got = Ann.lshTopK(all.filter($"vec_id" === 10L), all, nBits = 4, k = 3)
    val rows = got.select($"cand_id", $"cos").as[(Long, Double)].collect().toMap
    // vec 0 is bit-identical to the probe → same bucket, cosine 1.0
    assert(rows.get(0L).contains(1.0))
  }

  test("ivf cell stats include empty cells and balance sums to the cell count") {
    // Three centroids; every vector lands nearest centroid 0 or 1, so
    // cell 2 must still appear with a zero count (the wasted-probe
    // signal a groupBy alone would silently drop).
    val cents = Seq(
      (0, Array(1.0, 0.0)), (1, Array(0.0, 1.0)), (2, Array(-1.0, -1.0)))
      .toDF("cent_id", "ce")
    val vecs = Seq(
      (10L, Array(0.9f, 0.1f)), (11L, Array(0.8f, 0.2f)),
      (12L, Array(0.1f, 0.9f)), (13L, Array(0.9f, 0.2f)))
      .toDF("vec_id", "embedding")
    val got = Ann.ivfCellStats(cents, vecs)
      .as[(Int, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set(0, 1, 2))
    assert(got(0)._2 == 3L && got(1)._2 == 1L && got(2)._2 == 0L)
    assert(got(2)._3 == 0.0 && got(2)._4 == 0.0)
    // fractions form a distribution; balance averages to 1 over cells
    assert(math.abs(got.values.map(_._3).sum - 1.0) < 1e-9)
    assert(math.abs(got.values.map(_._4).sum / 3.0 - 1.0) < 1e-9)
  }

  test("pinTiny keeps values/schema for tiny frames and rejects big ones") {
    val tiny = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val pinned = Ann.pinTiny(tiny)
    assert(pinned.schema == tiny.schema)
    assert(pinned.as[(Long, String)].collect().toSet == Set((1L, "a"), (2L, "b")))
    // the guard must fire BEFORE a full collect (limit-bounded): a
    // frame over the cap throws instead of pinning driver-side
    val big = spark.range(Ann.MaxPinRows + 1L).toDF("id")
    val e = intercept[IllegalArgumentException](Ann.pinTiny(big))
    assert(e.getMessage.contains("provably-tiny"))
  }
}
