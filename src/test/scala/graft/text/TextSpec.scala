package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class TextSpec extends SparkTestBase {
  import spark.implicits._

  test("tokens split on whitespace and drop empties") {
    val got = Seq("a  b c").toDF("t")
      .select(Text.tokens($"t")).as[Seq[String]].head()
    assert(got == Seq("a", "b", "c"))
  }

  test("shingles are 1-based sliding word windows; short docs yield none") {
    val got = Seq("a b c d").toDF("t")
      .select(Text.shingles($"t", 3)).as[Seq[String]].head()
    assert(got == Seq("a b c", "b c d"))
    val short = Seq("a b").toDF("t")
      .select(Text.shingles($"t", 3)).as[Seq[String]].head()
    assert(short.isEmpty)
  }

  test("fingerprint is order-sensitive") {
    val fp = Seq("alpha beta", "beta alpha").toDF("t")
      .select(Text.fingerprint($"t")).as[Long].collect()
    assert(fp(0) != fp(1))
  }

  test("repetitionStats computes the Gopher-style repetition fractions") {
    val df = Seq(
      (1L, "a a a b"),   // top 3/4; dup tokens 1-2/4; 2-grams [a a, a a, a b]
      (2L, "a b c d e f"), // no repetition; top frac 1/6 under the 0.2 bar
      (3L, "x")          // single token: no 2-grams, top fraction 1.0
    ).toDF("doc_id", "text")
    val got = Text.repetitionStats(df, $"doc_id", $"text")
      .orderBy($"doc_id")
      .as[(Long, Long, Double, Double, Double, Long)].collect()
    // doc 1: 2-gram dup fraction = round(1 - 2/3, 6)
    assert(got(0) == ((1L, 4L, 0.75, 0.5, 0.333333, 1L)))
    assert(got(1) == ((2L, 6L, 0.166667, 0.0, 0.0, 0L)))
    assert(got(2) == ((3L, 1L, 1.0, 0.0, 0.0, 1L)))
  }

  test("quality score stays in [0,1] on the real corpus") {
    val q = spark.read.parquet(s"${sf()}/documents.parquet")
      .select(Text.qualityScore($"text")).as[Double].collect()
    assert(q.forall(v => v >= 0.0 && v <= 1.0))
  }

  test("token entropy is 0 for constant docs and ln(n) for all-distinct docs") {
    val df = Seq((1L, "a a a a"), (2L, "a b c d")).toDF("doc_id", "text")
    val got = Text.tokenEntropy(df, $"doc_id", $"text")
      .select($"doc_id", $"token_entropy").as[(Long, Double)].collect().toMap
    assert(got(1L) == 0.0)
    assert(math.abs(got(2L) - math.log(4.0)) < 1e-5)
  }

  test("bigramLogProb scores add-1-smoothed conditional probabilities") {
    // Corpus: "a b a b" + "a b". Bigrams: (a,b)×3, (b,a)×1; contexts:
    // a→3, b→1; V=2. P(b|a) = (3+1)/(3+2) = 0.8, P(a|b) = (1+1)/(1+2).
    val df = Seq((1L, "a b a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Text.bigramLogProb(df, $"doc_id", $"text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    val pAB = -math.log(0.8)
    val pBA = -math.log(2.0 / 3.0)
    assert(got(1L)._1 == 3L)
    assert(math.abs(got(1L)._2 - (2 * pAB + pBA) / 3.0) < 1e-5)
    assert(got(2L) == ((1L,
      BigDecimal(pAB).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)))
  }

  test("langid marker scoring picks the language whose markers dominate") {
    val df = Seq("le la et le la spark", "der die und der join").toDF("text")
    val scores = Text.langScores($"text")
    val cols = scores.map { case (l, c) => c.as(s"s_$l") }
    val got = df.select(cols: _*).collect()
    val langs = scores.map(_._1)
    val best0 = langs(got(0).toSeq.map(_.asInstanceOf[Int]).zipWithIndex.maxBy(_._1)._2)
    val best1 = langs(got(1).toSeq.map(_.asInstanceOf[Int]).zipWithIndex.maxBy(_._1)._2)
    assert(best0 == "fr")
    assert(best1 == "de")
  }

  test("gopher rules report per-rule verdicts, n_fail, and pass") {
    // doc 1: 30 normal words with stopwords → passes everything.
    // doc 2: 5 words → fails word count only.
    // doc 3: long but symbol-soup tokens → fails symbol + alpha-word
    //        rules (and has no stopwords).
    val good = (Seq("the", "and", "of") ++
      (0 until 27).map(i => "word" + ('a' + i % 26).toChar)).mkString(" ")
    val short = "the and tiny doc"
    val noise = (Seq("the", "and") ++ (1 to 28).map(_ => "$$$###%%%")).mkString(" ")
    val df = Seq((1L, good), (2L, short), (3L, noise)).toDF("id", "txt")
    val got = Text.gopherRules(df, $"id", $"txt")
      .as[(Long, Long, Boolean, Boolean, Boolean, Boolean, Boolean, Long, Boolean)]
      .collect().map(r => r._1 -> r).toMap
    val (_, n1, wc1, ml1, sym1, aw1, sk1, nf1, p1) = got(1L)
    assert(n1 == 30L && wc1 && ml1 && sym1 && aw1 && sk1 && nf1 == 0L && p1)
    val (_, _, wc2, _, _, _, sk2, nf2, p2) = got(2L)
    assert(!wc2 && sk2 && nf2 == 1L && !p2)
    val (_, _, wc3, _, sym3, aw3, _, nf3, p3) = got(3L)
    assert(wc3 && !sym3 && !aw3 && nf3 >= 2L && !p3)
  }

  test("chunk emits overlapping windows whose last chunk reaches the end") {
    // n=8, window=4, step=3 → starts 0,3,6; the 6-start chunk is the
    // 2-token tail that a naive every-multiple-below-n rule would
    // follow with a degenerate pure-suffix chunk.
    val df = Seq((1L, "a b c d e f g h")).toDF("id", "txt")
    val got = Text.chunk(df, $"id", $"txt", window = 4, overlap = 1)
      .orderBy($"chunk_idx")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq(
      (1L, 0L, 0L, 4L, "a b c d"),
      (1L, 1L, 3L, 4L, "d e f g"),
      (1L, 2L, 6L, 2L, "g h")))
  }

  test("chunk: short docs yield one whole-doc chunk; empty docs none") {
    val df = Seq((1L, "a b"), (2L, ""), (3L, "   ")).toDF("id", "txt")
    val got = Text.chunk(df, $"id", $"txt", window = 4, overlap = 1)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got.toSeq == Seq((1L, 0L, 0L, 2L, "a b")))
  }

  test("chunk covers every token exactly: union of chunks = [0, n)") {
    val docs = spark.read.parquet(s"${sf()}/documents.parquet")
    val chunks = Text.chunk(docs, $"doc_id", $"text", window = 32, overlap = 8)
      .groupBy($"doc_id")
      .agg(
        org.apache.spark.sql.functions.min($"start_token").as("first"),
        org.apache.spark.sql.functions.max($"start_token" + $"chunk_tokens")
          .as("end"),
        org.apache.spark.sql.functions.min($"chunk_tokens").as("min_len"))
    val n = docs.select($"doc_id", Text.tokenCount($"text").as("n"))
    val bad = chunks.join(n, "doc_id")
      .where($"first" =!= 0L || $"end" =!= $"n" || $"min_len" <= 0L)
      .count()
    assert(bad == 0L, "every document must be covered start-to-end")
  }

  test("qualityFunnel stage counts agree with the per-signal operators") {
    // The funnel's fused per-row reformulations (sorted-run fold for
    // top-token count, array_distinct for 2-gram dups, token-shared
    // langid) must count EXACTLY what the standalone gates count on
    // the real corpus — recompute each stage from t01/t16/t08's own
    // frames and compare.
    val docs = spark.read
      .parquet("/root/testdata/sf0.001/documents.parquet")
    val funnel = Text.qualityFunnel(docs, $"doc_id", $"text")
      .as[(String, Long)].collect().toMap
    val lang = Text.bestLang(Text.langScores($"text"))
    val flagged = docs.select($"doc_id", (lang === "en").as("f_lang"))
    val gopher = Text.gopherRules(docs, $"doc_id", $"text")
      .select($"doc_id".as("g_doc"), $"pass")
    val rep = Text.repetitionStats(docs, $"doc_id", $"text")
      .select($"doc_id".as("r_doc"), $"repetitive")
    val joined = flagged
      .join(gopher, $"doc_id" === $"g_doc", "left")
      .join(rep, $"doc_id" === $"r_doc", "left")
    val expected = joined.agg(
        count(lit(1)),
        sum($"f_lang".cast("long")),
        sum(($"f_lang" && $"pass").cast("long")),
        sum(($"f_lang" && $"pass" &&
          coalesce($"repetitive", lit(0L)) === 0L).cast("long")))
      .as[(Long, Long, Long, Long)].head()
    assert(funnel("1_all") == expected._1)
    assert(funnel("2_lang") == expected._2)
    assert(funnel("3_gopher") == expected._3)
    assert(funnel("4_repetition") == expected._4)
    assert(funnel("1_all") >= funnel("2_lang") &&
      funnel("2_lang") >= funnel("3_gopher") &&
      funnel("3_gopher") >= funnel("4_repetition"),
      "funnel stages must be monotonically non-increasing")
  }

  test("piiScrub masks emails, IPs, and long digit runs in fixed order") {
    val rows = Seq(
      (1L, "mail a.b+c@sub.ex.org and bob@ex.co now"),
      (2L, "srv 10.0.255.1 and 192.168.0.12, acct 123456789 ok"),
      (3L, "mixed x@y.io at 8.8.8.8 ref 99999999999"),
      (4L, "clean text, short 12345678 and ip-ish 1.2.3 stay"),
      (5L, "")).toDF("id", "t")
    val got = Text.piiScrub(rows, $"id", $"t")
      .as[(Long, Long, Long, Long, String)].collect()
      .map(r => r._1 -> r).toMap
    assert(got(1L) == (1L, 2L, 0L, 0L, "mail <EMAIL> and <EMAIL> now"))
    assert(got(2L) == (2L, 0L, 2L, 1L, "srv <IP> and <IP>, acct <ID> ok"))
    assert(got(3L) == (3L, 1L, 1L, 1L, "mixed <EMAIL> at <IP> ref <ID>"))
    // 8-digit run is below the threshold; 1.2.3 is not a full IPv4
    assert(got(4L) ==
      (4L, 0L, 0L, 0L, "clean text, short 12345678 and ip-ish 1.2.3 stay"))
    assert(got(5L) == (5L, 0L, 0L, 0L, ""))
  }

  test("bm25TopK: Lucene-idf scores, rank order, and no-term docs excluded") {
    val docs = Seq(
      (1L, "a a b"),   // tf(a)=2, dl=3
      (2L, "a c"),     // tf(a)=1, dl=2
      (3L, "c c c c")) // no query term — must be absent
      .toDF("doc_id", "text")
    val got = Text.bm25TopK(docs, Seq("a"), k = 10)
      .as[(Long, Long, Double)].collect().sortBy(_._2)
    // closed form: N=3, avgdl=3, df(a)=2 → idf = ln(1.6)
    val idf = math.log((3.0 - 2 + 0.5) / (2 + 0.5) + 1)
    def w(tf: Double, dl: Double) =
      BigDecimal(idf * tf * 2.2 / (tf + 1.2 * (1 - 0.75 + 0.75 * dl / 3.0)))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == Seq(1L, 2L), "rank order by score desc")
    assert(got.map(_._2).toSeq == Seq(1L, 2L))
    assert(got(0)._3 == w(2, 3) && got(1)._3 == w(1, 2))
    // k bounds the list; ties break by doc_id
    val tied = Text.bm25TopK(Seq((5L, "a"), (4L, "a")).toDF("doc_id", "text"),
      Seq("a"), k = 1).as[(Long, Long, Double)].collect()
    assert(tied.toSeq.map(r => (r._1, r._2)) == Seq((4L, 1L)))
  }

  test("bm25TopKFromIndex serves bit-identical results to the corpus scan") {
    val docs = Seq(
      (1L, "a a b x"), (2L, "a c"), (3L, "c c c c"),
      (4L, "b b a"), (5L, "x y z a b"))
      .toDF("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft-lexidx-").toString
    try {
      Text.buildLexicalIndex(docs, dir)
      for (terms <- Seq(Seq("a"), Seq("a", "b"), Seq("b", "x", "z"))) {
        val scan = Text.bm25TopK(docs, terms, k = 10)
          .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)
        val served = Text.bm25TopKFromIndex(spark, dir, terms, k = 10)
          .as[(Long, Long, Double)].collect().toSeq.sortBy(_._2)
        assert(served == scan, s"index-served must equal corpus scan for $terms")
      }
      // a term absent from the corpus contributes nothing either way
      val missing = Text.bm25TopKFromIndex(spark, dir, Seq("absent"), k = 10)
        .collect()
      assert(missing.isEmpty)
    } finally {
      def rm(f: java.io.File): Unit = {
        Option(f.listFiles()).foreach(_.foreach(rm)); f.delete(): Unit
      }
      rm(new java.io.File(dir))
    }
  }

  test("UnicodeNormalize: NFC composes, NFKC folds compatibility forms, null passes") {
    import graft.functions.TextExpressions
    val df = Seq(
      (1L, "é"),       // decomposed é
      (2L, "åb"),      // decomposed å + b
      (3L, "ﬁle"),      // ﬁ ligature → "file" under NFKC only
      (4L, null.asInstanceOf[String]))
      .toDF("id", "t")
    val got = df.select($"id", TextExpressions.nfc($"t").as("c"),
        TextExpressions.nfkc($"t").as("k"))
      .as[(Long, String, String)].collect().sortBy(_._1)
    assert(got(0) == (1L, "\u00E9", "\u00E9"))
    assert(got(1) == (2L, "\u00E5b", "\u00E5b"))
    assert(got(2)._2 == "\uFB01le" && got(2)._3 == "file")
    assert(got(3)._2 == null && got(3)._3 == null)
    // idempotent: normalizing twice is the same column value
    val twice = df.filter($"t".isNotNull)
      .select((TextExpressions.nfc(TextExpressions.nfc($"t")) ===
        TextExpressions.nfc($"t")).as("eq")).as[Boolean].collect()
    assert(twice.forall(identity))
  }
}
