package graft.dedup

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class DedupSpec extends SparkTestBase {

  test("connectedComponents groups chained pairs and keeps singletons") {
    import spark.implicits._
    val nodes = (1L to 7L).toDF("doc")
    // components: {1,2,3} (chain), {5,6}, singletons {4}, {7}
    val edges = Seq((1L, 2L), (2L, 3L), (5L, 6L)).toDF("doc_a", "doc_b")
    val got = graft.dedup.Dedup
      .connectedComponents(nodes, edges, "doc_a", "doc_b")
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 4L,
      5L -> 5L, 6L -> 5L, 7L -> 7L))
  }
  import spark.implicits._

  private val docs = Seq(
    (1L, "the quick brown fox jumps over the lazy dog again and again"),
    (2L, "the quick brown fox jumps over the lazy dog again and again"), // exact dup of 1
    (3L, "the quick brown fox jumps over the lazy cat again and again"), // near dup of 1
    (4L, "completely different words about spark engines and shuffles here")
  ).toDF("doc_id", "text")

  test("exact dedup groups identical texts under one representative") {
    val got = Dedup.exact(docs, $"doc_id", $"text")
      .as[(String, Long, Long)].collect()
    assert(got.length == 3)
    val dup = got.find(_._3 == 2L).get
    assert(dup._2 == 1L) // representative = min id
  }

  test("minhash signature is identical for identical docs, close for near-dups") {
    val sig = Dedup.minHashLong(docs, $"doc_id", $"text", k = 16)
      .as[(Long, Int, Long)].collect()
      .groupBy(_._1).view.mapValues(_.sortBy(_._2).map(_._3).toSeq).toMap
    assert(sig(1L) == sig(2L))
    val agree13 = sig(1L).zip(sig(3L)).count { case (a, b) => a == b }
    val agree14 = sig(1L).zip(sig(4L)).count { case (a, b) => a == b }
    assert(agree13 > agree14)
    assert(agree14 == 0)
  }

  test("lsh candidates surface the exact-dup pair") {
    val pairs = Dedup.lshCandidates(docs, $"doc_id", $"text", k = 16, r = 4)
      .select($"doc_a", $"doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical docs share a fingerprint, unrelated docs differ") {
    val fp = Dedup.simHash(docs, $"doc_id", $"text")
      .as[(Long, Long)].collect().toMap
    assert(fp(1L) == fp(2L))
    assert(fp(1L) != fp(4L))
    assert(fp.values.forall(_ >= 0)) // 63-bit: always fits signed-64
  }

  test("jaccard pairs: dup pair at 1.0, near-dup pair high, others absent") {
    val got = Dedup.jaccardPairs(docs, $"doc_id", $"text", shingleN = 3, threshold = 0.4)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 2L)) == 1.0)
    assert(got((1L, 3L)) > 0.4 && got((1L, 3L)) < 1.0)
    assert(!got.keySet.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("minhash quality: exact dup estimates 1.0 and matches truth exactly") {
    val got = Dedup.minHashQuality(docs, $"doc_id", $"text",
        shingleN = 3, k = 16, r = 4)
      .as[(Long, Long, Double, Double)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // identical docs: all 16 lanes agree AND the true Jaccard is 1.0
    assert(got((1L, 2L)) == ((1.0, 1.0)))
    // any near-dup candidate's estimate stays a valid fraction of k
    got.values.foreach { case (est, j) =>
      assert(est >= 0.0 && est <= 1.0 && j > 0.0)
    }
  }

  test("jaccardForPairs keeps zero-overlap and shingle-less pairs at 0.0") {
    val pairs = Seq((1L, 4L), (1L, 5L)).toDF("doc_a", "doc_b")
    // doc 5 has 2 tokens → no 3-shingles at all
    val withShort = docs.union(Seq((5L, "too short")).toDF("doc_id", "text"))
    val got = Dedup.jaccardForPairs(withShort, $"doc_id", $"text",
        shingleN = 3, pairs)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(got((1L, 4L)) == 0.0, "disjoint docs must keep a 0.0 row")
    assert(got((1L, 5L)) == 0.0, "a shingle-less doc must keep a 0.0 row")
    assert(got.size == 2)
  }

  test("signatures: the materialize-once frames equal the one-shot APIs") {
    val sg = Dedup.signatures(docs, $"doc_id", $"text", k = 8)
    try {
      def rows(df: org.apache.spark.sql.DataFrame) =
        df.collect().map(_.toSeq).toSet
      assert(rows(sg.minhash) ==
        rows(Dedup.minHashLong(docs, $"doc_id", $"text", k = 8)))
      assert(rows(sg.simhash) == rows(Dedup.simHash(docs, $"doc_id", $"text")))
      // candidate generation and verify over the shared frames match
      // the self-contained forms bit-for-bit
      assert(rows(Dedup.lshCandidatesFromSig(sg.minhash, r = 4)) ==
        rows(Dedup.lshCandidates(docs, $"doc_id", $"text", k = 8, r = 4)))
      val pairs = Seq((1L, 2L), (1L, 3L), (1L, 4L)).toDF("doc_a", "doc_b")
      assert(rows(Dedup.jaccardForShingles(sg.shingles, pairs)) ==
        rows(Dedup.jaccardForPairs(docs, $"doc_id", $"text", 3, pairs)))
      // all four frames are persisted (the point of the bundle)
      assert(Seq(sg.tokens, sg.shingles, sg.minhash, sg.simhash)
        .forall(_.storageLevel.useMemory))
    } finally sg.unpersist()
  }

  test("segment dedup: first occurrence survives, repeats are counted") {
    // segLen=2 → doc 10: [a b][c d]; doc 11: [a b][e f]; doc 12: [a b]
    // plus a trailing partial [g]. Segment "a b" first occurs at
    // (10, 0); its copies in 11 and 12 are dups. Everything else is
    // unique.
    val segDocs = Seq(
      (10L, "a b c d"),
      (11L, "a b e f"),
      (12L, "a b g")).toDF("doc_id", "text")
    val got = Dedup.segmentDedup(segDocs, $"doc_id", $"text", segLen = 2)
      .select($"doc_id", $"n_segments", $"n_dup_segments")
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 2L, 0L), (11L, 2L, 1L), (12L, 2L, 1L)))
  }

  test("indexDedupBatch flags batch docs colliding with the persisted index") {
    // Corpus index: doc 1 has band (0,100); doc 2 has (0,100) and
    // (1,200). Batch doc 10 collides with both (n_dups=2, first=1),
    // doc 11 collides with nothing, doc 12 has no bands at all (too
    // short to shingle) but must still get a not-a-dup verdict.
    val index = Seq((1L, 0, 100L), (2L, 0, 100L), (2L, 1, 200L))
      .toDF("doc", "band", "bh")
    val batchBands = Seq((10L, 0, 100L), (10L, 1, 200L), (11L, 0, 999L))
      .toDF("doc", "band", "bh")
    val batchDocs = Seq(10L, 11L, 12L).toDF("doc")
    val got = Dedup.indexDedupBatch(index, batchBands, batchDocs)
      .as[(Long, Long, Long)].collect().toSet
    assert(got === Set((10L, 2L, 1L), (11L, 0L, -1L), (12L, 0L, -1L)))
  }

  test("two-batch ingestion: admitted docs join the index, dups do not") {
    // Batch 1 vs corpus index {1}: doc 10 collides (dup), doc 11 is
    // admitted. After write-back the index must contain 11's bands but
    // NOT 10's — so batch 2's doc 20 (sharing 11's band) is flagged a
    // dup of 11, and doc 21 (sharing only 10's band signature, which
    // was never admitted) stays clean.
    // Doc 12 duplicates doc 11 WITHIN the batch: both are corpus-clean
    // but only the lower id may join the index.
    val index0 = Seq((1L, 0, 100L)).toDF("doc", "band", "bh")
    val b1Bands = Seq((10L, 0, 100L), (11L, 0, 555L), (12L, 0, 555L))
      .toDF("doc", "band", "bh")
    val v1 = Dedup.indexDedupBatch(index0, b1Bands,
      Seq(10L, 11L, 12L).toDF("doc"))
    val index1 = index0.union(Dedup.admitBands(b1Bands, v1))
    assert(index1.as[(Long, Int, Long)].collect().toSet ===
      Set((1L, 0, 100L), (11L, 0, 555L)))
    val b2Bands = Seq((20L, 0, 555L), (21L, 1, 777L)).toDF("doc", "band", "bh")
    val v2 = Dedup.indexDedupBatch(index1, b2Bands, Seq(20L, 21L).toDF("doc"))
      .as[(Long, Long, Long)].collect().toSet
    assert(v2 === Set((20L, 1L, 11L), (21L, 0L, -1L)))
  }

  test("duplicate spans catch a copied passage that straddles segment bounds") {
    // doc 2 copies a 4-token passage of doc 1 at a different offset —
    // every 3-token window inside the copy collides; doc 2's unique
    // tail does not. doc 3 is too short for any window.
    val df = Seq(
      (1L, "a b c d e f"),
      (2L, "x c d e f y"),
      (3L, "z q")).toDF("id", "txt")
    val got = Dedup.duplicateSpans(df, $"id", $"txt", winLen = 3)
      .as[(Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    // doc 1: 4 windows, all first occurrences
    assert(got(1L) == ((1L, 4L, 0L, 0.0)))
    // doc 2: 4 windows; "c d e" and "d e f" were seen in doc 1
    assert(got(2L) == ((2L, 4L, 2L, 0.5)))
    assert(!got.contains(3L), "sub-window docs have no spans to match")
    // within-doc repetition is charged too: the second "a b a" window
    // of a self-repeating doc is a dup of the first
    val rep = Seq((9L, "a b a b a b a")).toDF("id", "txt")
    val r9 = Dedup.duplicateSpans(rep, $"id", $"txt", winLen = 3)
      .as[(Long, Long, Long, Double)].collect().head
    assert(r9._2 == 5L && r9._3 == 3L)
  }
}
