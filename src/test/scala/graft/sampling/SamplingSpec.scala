package graft.sampling

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SamplingSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = spark.read.parquet(s"${sf()}/documents.parquet")

  test("stratified sample is deterministic and respects per-stratum rates") {
    val a = Sampling.stratifiedSampleDerived(
      docs.select($"doc_id", $"source"), $"source", $"doc_id")
    val b = Sampling.stratifiedSampleDerived(
      docs.select($"doc_id", $"source"), $"source", $"doc_id")
    val idsA = a.select($"doc_id").as[Long].collect().sorted.toSeq
    assert(idsA == b.select($"doc_id").as[Long].collect().sorted.toSeq)
    assert(idsA.nonEmpty && idsA.size < docs.count())
    // derived rates live in [10, 90]
    val rates = a.select($"rate_pct").distinct().as[Long].collect()
    assert(rates.forall(r => r >= 10 && r <= 90))
  }

  test("sample decisions are stable under corpus growth") {
    // sampling the first half of the corpus keeps exactly the rows the
    // full-corpus sample kept from that half — no reshuffle drift
    val half = docs.filter($"doc_id" < 250).select($"doc_id", $"source")
    val full = Sampling.stratifiedSampleDerived(
        docs.select($"doc_id", $"source"), $"source", $"doc_id")
      .filter($"doc_id" < 250).select($"doc_id").as[Long].collect().sorted.toSeq
    val sub = Sampling.stratifiedSampleDerived(half, $"source", $"doc_id")
      .select($"doc_id").as[Long].collect().sorted.toSeq
    assert(full == sub)
  }

  test("mixture weights equalize toward the uniform target") {
    val w = Sampling.mixtureWeights(docs, $"source",
      graft.text.Text.tokenCount($"text"))
    val rows = w.select($"token_frac", $"mix_weight", $"repeat_factor")
      .as[(Double, Double, Long)].collect()
    assert(math.abs(rows.map(_._1).sum - 1.0) < 1e-3)
    assert(rows.forall(_._2 > 0.0))
    assert(rows.forall(r => r._3 >= 1L && r._3 <= 5L))
    // a domain with above-average token share must be down-weighted
    val n = rows.length
    rows.foreach { case (frac, weight, _) =>
      if (frac > 1.0 / n) assert(weight < 1.0) else assert(weight >= 0.99)
    }
  }

  test("applyMixture emits floor(w) copies per doc and drops NULL-weight sources") {
    import org.apache.spark.sql.functions.col
    val mix = Seq((1L, "a"), (2L, "a"), (3L, "b"), (4L, "z"))
      .toDF("doc_id", "source")
    // Integer weights make the copy count exact (no fractional-hash
    // branch); the NULL-weight source must vanish entirely.
    val weights = Seq(("a", Some(2.0)), ("b", Some(1.0)), ("z", None))
      .toDF("source", "mix_weight")
    val got = Sampling.applyMixture(mix, col("doc_id"), col("source"), weights)
      .as[(Long, String, Long)].collect().toSet
    assert(got === Set(
      (1L, "a", 1L), (1L, "a", 2L), (2L, "a", 1L), (2L, "a", 2L),
      (3L, "b", 1L)))
  }

  test("temperature mixture upsamples the tail and preserves share mass") {
    import org.apache.spark.sql.functions.col
    // 90/10 token split: at α = ½ the target shares are
    // sqrt(.9)/(sqrt(.9)+sqrt(.1)) ≈ 0.75 and ≈ 0.25.
    val docs = Seq(("big", 900L), ("tail", 100L))
      .flatMap { case (s, n) => Seq((s, n)) }.toDF("source", "nt")
    val got = Sampling.temperatureMixture(docs, col("source"), col("nt"))
      .as[(String, Long, Long, Double, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    val (_, _, _, pBig, qBig, wBig) = got("big")
    val (_, _, _, pTail, qTail, wTail) = got("tail")
    assert(pBig == 0.9 && pTail == 0.1)
    assert(math.abs(qBig - 0.75) < 0.001 && math.abs(qTail - 0.25) < 0.001)
    // weights move both shares toward the target: tail up, head down
    assert(wTail > 1.0 && wBig < 1.0)
    // tempered shares are still a distribution
    assert(math.abs(qBig + qTail - 1.0) < 1e-9)
    // α = 1 keeps the natural mixture (weight 1 everywhere)
    val nat = Sampling.temperatureMixture(docs, col("source"), col("nt"),
        alpha = 1.0)
      .select(col("sample_weight")).as[Double].collect()
    assert(nat.forall(w => math.abs(w - 1.0) < 1e-9))
  }

  test("dsirWeights scores target-like documents higher, to the micro-nat") {
    import org.apache.spark.sql.functions.col
    val raw = Seq((1L, "x x x x"), (2L, "y y y y")).toDF("doc_id", "text")
    val target = Seq((9L, "x x x x x")).toDF("doc_id", "text")
    val got = Sampling.dsirWeights(raw, target, col("doc_id"), col("text"),
        buckets = 64)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r).toMap
    // The expected weights assume "x" and "y" hash to DIFFERENT
    // buckets (each doc's tokens then meet exactly one ratio row); a
    // future hash change that collides them would silently change the
    // arithmetic below, so pin the assumption explicitly first.
    val bx = Math.floorMod(graft.functions.Portable.hash64Of("x"), 64L)
    val by = Math.floorMod(graft.functions.Portable.hash64Of("y"), 64L)
    assert(bx != by,
      s"test precondition: tokens 'x' (bucket $bx) and 'y' (bucket $by) " +
        "must land in distinct 64-buckets — pick different tokens if the " +
        "hash function changed")
    // Replicate the add-1-smoothed log-ratio arithmetic exactly:
    // target {x:5}, raw {x:4, y:4}; totals 5 and 8, 64 buckets.
    // Single-ln rational form — must mirror Sampling.dsirWeights.
    def lr(nT: Long, nR: Long): Long =
      math.floor(math.log(((nT + 1).toDouble * (8 + 64).toDouble) /
        ((nR + 1).toDouble * (5 + 64).toDouble)) * 1e6).toLong
    assert(got(1L) == ((1L, 4L, 4 * lr(5, 4))))
    assert(got(2L) == ((2L, 4L, 4 * lr(0, 4))))
    assert(got(1L)._3 > got(2L)._3,
      "the target-distributed document must outscore the off-target one")
  }
}
