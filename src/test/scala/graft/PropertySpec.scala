package graft

import scala.util.Random

import org.apache.spark.sql.functions._

import graft.operators.{AsOfJoin, Filters, IntervalJoin, Partitioning}

/**
 * Property-style laws for the operators whose correctness is
 * algebraic rather than example-shaped — the upgrade over the
 * reference's example-only TestNG suites (SURVEY.md §5). Inputs are
 * drawn from a fixed-seed generator (deterministic across runs).
 */
class PropertySpec extends SparkTestBase {
  import spark.implicits._

  private val Rounds = 8

  test("hashShard: shards partition the input (complete, no overlap)") {
    val rnd = new Random(41)
    for (_ <- 1 to Rounds) {
      val p = 2 + rnd.nextInt(7)
      val xs = List.fill(60)(rnd.nextLong() % 1000)
      val df = xs.toDF("k")
      val perShard = (0 until p)
        .map(i => df.filter(Filters.hashShard(Seq($"k"), p, Seq(i))).count())
      assert(perShard.sum == xs.length, s"p=$p lost/doubled rows")
    }
  }

  test("seekAfter: equivalent to lexicographic tuple comparison") {
    val rnd = new Random(42)
    for (_ <- 1 to Rounds) {
      val xs = List.fill(40)((rnd.nextInt(9).toLong, rnd.nextInt(9).toLong))
      val (a, b) = (rnd.nextInt(9).toLong, rnd.nextInt(9).toLong)
      val got = xs.toDF("k1", "k2")
        .filter(Filters.seekAfter(Seq($"k1", $"k2"), Seq(a, b)))
        .as[(Long, Long)].collect().toSet
      val want = xs.filter { case (x, y) => x > a || (x == a && y > b) }.toSet
      assert(got == want, s"after=($a,$b)")
    }
  }

  test("saltedAgg: equals direct groupBy for any data and salt count") {
    val rnd = new Random(43)
    for (_ <- 1 to Rounds) {
      val xs = List.fill(50)(
        (Seq("a", "b", "c")(rnd.nextInt(3)), rnd.nextInt(201).toLong - 100L))
      val salts = 1 + rnd.nextInt(16)
      val df = xs.toDF("k", "v")
      val direct = df.groupBy($"k")
        .agg(count(lit(1)).as("n"), sum($"v").as("s"))
        .as[(String, Long, Long)].collect().toSet
      val salted = Partitioning.saltedAgg(df, $"k", $"v", salts,
          Seq((count(lit(1)), "n"), (sum($"v"), "s")))
        .select($"__k", $"n", $"s").as[(String, Long, Long)].collect().toSet
      assert(salted == direct, s"salts=$salts")
    }
  }

  test("saltedJoin: equals the plain join for any data and salt count") {
    val rnd = new Random(45)
    for (_ <- 1 to Rounds) {
      val fact = List.fill(40)(
        (Seq("x", "y", "z")(rnd.nextInt(3)), rnd.nextInt(1000).toLong))
        .toDF("k", "v")
      val build = List("x", "y", "z").map(k => (k, s"dim_$k")).toDF("k", "label")
      val salts = 1 + rnd.nextInt(8)
      val plain = fact.join(build, "k")
        .as[(String, Long, String)].collect().sorted.toSeq
      val salted = Partitioning.saltedJoin(fact, build, "k", $"v", salts)
        .select($"k", $"v", $"label")
        .as[(String, Long, String)].collect().sorted.toSeq
      assert(salted == plain, s"salts=$salts")
    }
  }

  test("interval join: equals the naive range join for any window") {
    val rnd = new Random(46)
    for (_ <- 1 to Rounds) {
      // timestamps cluster around bucket edges to stress the
      // explode-to-two-buckets correctness argument
      val windowUs = (1L + rnd.nextInt(5)) * 1000000L
      val rows = List.tabulate(40) { i =>
        val us = rnd.nextInt(12) * windowUs / 3 + rnd.nextInt(3)
        (i.toLong, 1L + rnd.nextInt(3), us)
      }
      val df = rows
        .map { case (id, u, us) => (id, u, new java.sql.Timestamp(us / 1000L)) }
        .toDF("event_id", "user_id", "ts")
      // microsecond sub-millis truncated by Timestamp: recompute in µs
      val usOf = rows.map { case (id, _, us) => id -> (us / 1000L) * 1000L }.toMap
      val got = IntervalJoin.intervalJoin(df, df, "user_id", "ts", windowUs)
        .select($"p_event_id", $"c_event_id")
        .as[(Long, Long)].collect().toSet
      val want = (for {
        (aId, aU, _) <- rows
        (bId, bU, _) <- rows
        if aU == bU && usOf(bId) > usOf(aId) && usOf(bId) <= usOf(aId) + windowUs
      } yield (aId, bId)).toSet
      assert(got == want, s"window=$windowUs")
    }
  }

  test("asof join: equals per-row scan of the right side") {
    val rnd = new Random(44)
    for (_ <- 1 to Rounds) {
      def rows() = List.fill(30)(
        (1L + rnd.nextInt(4), rnd.nextInt(21).toLong, rnd.nextInt(1000).toLong))
      // right side unique per (key, time): keep max value
      val right = rows().groupBy(r => (r._1, r._2))
        .map { case ((k, t), g) => (k, t, g.map(_._3).max) }.toList
      val left = rows().zipWithIndex.map { case ((k, t, _), i) => (k, t, i.toLong) }
      val got = AsOfJoin.latestBefore(
          left.toDF("user_id", "ts", "click_id"),
          right.toDF("user_id", "ts", "purchase_id"),
          "user_id", "ts", Seq("purchase_id"))
        .select($"click_id", $"purchase_id")
        .as[(Long, Option[Long])].collect().toMap
      val want = left.map { case (k, t, id) =>
        id -> right.filter(r => r._1 == k && r._2 <= t)
          .sortBy(_._2).lastOption.map(_._3)
      }.toMap
      assert(got == want)
    }
  }

  test("indexDedupBatch: verdict totality and naive-recompute equality") {
    val rnd = new Random(47)
    for (_ <- 1 to Rounds) {
      def bandRows(ids: Seq[Long]) = ids.flatMap(doc =>
        List.fill(1 + rnd.nextInt(3))((doc, rnd.nextInt(3), rnd.nextInt(6).toLong)))
      val idx = bandRows(1L to 5L)
      val batch = bandRows(10L to 15L)
      val batchDocs = (10L to 17L).toList // 16, 17 have no bands at all
      val got = graft.dedup.Dedup.indexDedupBatch(
          idx.toDF("doc", "band", "bh"), batch.toDF("doc", "band", "bh"),
          batchDocs.toDF("doc"))
        .as[(Long, Long, Long)].collect().toSet
      val want = batchDocs.map { d =>
        val hits = for {
          (bd, b, h) <- batch if bd == d
          (cd, cb, ch) <- idx if cb == b && ch == h
        } yield cd
        (d, hits.distinct.size.toLong,
          if (hits.isEmpty) -1L else hits.min)
      }.toSet
      assert(got == want)
      // totality: every batch doc gets exactly one verdict row, and
      // n_dups == 0 iff first_dup == -1
      assert(got.map(_._1) == batchDocs.toSet)
      assert(got.forall { case (_, n, f) => (n == 0L) == (f == -1L) })
    }
  }

  test("applyMixture: copies per doc are floor(eff) or floor(eff)+1, contiguous, deterministic") {
    val rnd = new Random(48)
    for (_ <- 1 to Rounds) {
      val sources = Seq("a", "b", "c", "z")
      val docs = List.tabulate(30)(i => (i.toLong, sources(rnd.nextInt(4))))
      val weights = Seq(
        ("a", Some(rnd.nextDouble() * 7)), // may exceed the cap of 5
        ("b", Some(rnd.nextDouble())),     // fractional downweight
        ("c", Some(1.0 + rnd.nextDouble() * 3)),
        ("z", None)).toDF("source", "mix_weight")
      val wMap = weights.as[(String, Option[Double])].collect().toMap
      def run() = graft.sampling.Sampling.applyMixture(
          docs.toDF("doc_id", "source"), $"doc_id", $"source", weights)
        .as[(Long, String, Long)].collect().toSeq
      val got = run()
      assert(got.toSet == run().toSet, "resampling must be deterministic")
      val byDoc = got.groupBy(_._1)
      docs.foreach { case (id, src) =>
        wMap(src) match {
          case None => assert(!byDoc.contains(id), s"null-weight doc $id kept")
          case Some(w) =>
            val eff = math.min(w, 5.0)
            val n = byDoc.get(id).map(_.size).getOrElse(0)
            assert(n == math.floor(eff).toLong || n == math.floor(eff).toLong + 1,
              s"doc $id: $n copies for eff=$eff")
            // copy ordinals are exactly 1..n
            assert(byDoc.get(id).map(_.map(_._3).sorted)
              .getOrElse(Nil) == (1L to n).toList)
        }
      }
    }
  }

  test("pqTrainCodebook: one Lloyd refit never increases total assignment score") {
    val rnd = new Random(49)
    for (_ <- 1 to Rounds) {
      val dim = 4
      val vecs = List.tabulate(12)(i =>
        (i.toLong, Array.fill(dim)(rnd.nextInt(9).toFloat)))
        .toDF("vec_id", "embedding")
      val k = 2 + rnd.nextInt(2)
      val subs = graft.ann.Ann.pqSubvectors(vecs, m = 2)
      def totalMinScore(cb: org.apache.spark.sql.DataFrame): Double =
        subs.join(broadcast(cb), Seq("sub"))
          .withColumn("score", round(
            graft.ann.Ann.dot($"cv", $"cv") -
              lit(2.0) * graft.ann.Ann.dot($"sv", $"cv"), 6))
          .groupBy($"vec_id", $"sub").agg(min($"score").as("s"))
          .agg(sum($"s")).as[Double].head()
      val init = graft.ann.Ann.pqCodebook(subs, k)
      val trained = graft.ann.Ann.pqTrainCodebook(subs, k)
      assert(totalMinScore(trained) <= totalMinScore(init) + 1e-4,
        s"k=$k: refit increased total distortion")
    }
  }

  test("bigramLogProb: equals a naive in-memory bigram model") {
    val rnd = new Random(50)
    val vocab = Seq("a", "b", "c", "d")
    for (_ <- 1 to Rounds) {
      val corpus = List.tabulate(6)(i =>
        (i.toLong, List.fill(2 + rnd.nextInt(8))(
          vocab(rnd.nextInt(4))).mkString(" ")))
      val got = graft.text.Text.bigramLogProb(
          corpus.toDF("doc_id", "text"), $"doc_id", $"text")
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val toks = corpus.map { case (id, t) =>
        id -> t.split(" ").filter(_.nonEmpty).toList }
      val bigrams = toks.flatMap { case (id, ws) =>
        ws.zip(ws.drop(1)).map(id -> _) }
      val c2 = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
      val c1 = bigrams.groupBy(_._2._1).view.mapValues(_.size).toMap
      val v = toks.flatMap(_._2).distinct.size
      toks.foreach { case (id, ws) =>
        val bs = ws.zip(ws.drop(1))
        if (bs.nonEmpty) {
          val mean = bs.map(b =>
            -math.log((c2(b) + 1.0) / (c1(b._1) + v.toDouble))).sum / bs.size
          assert(got(id)._1 == bs.size.toLong)
          assert(math.abs(got(id)._2 - mean) < 5e-6, s"doc $id")
        } else assert(!got.contains(id))
      }
    }
  }

  test("duplicateSpans: equals a naive first-occurrence window model") {
    val rnd = new Random(51)
    val vocab = Seq("a", "b", "c", "d", "e")
    for (_ <- 1 to Rounds) {
      val win = 2 + rnd.nextInt(3)
      val corpus = List.tabulate(8)(i =>
        (i.toLong, List.fill(rnd.nextInt(12))(
          vocab(rnd.nextInt(5))).mkString(" ")))
      val got = graft.dedup.Dedup.duplicateSpans(
          corpus.toDF("doc_id", "text"), $"doc_id", $"text", win)
        .as[(Long, Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      // naive model: all windows in (doc, pos) order; first seen wins
      val wins = corpus.flatMap { case (id, t) =>
        val ws = t.split(" ").filter(_.nonEmpty).toList
        ws.sliding(win).filter(_.size == win).zipWithIndex
          .map { case (w, p) => (id, p, w.mkString(" ")) }
      }
      val firstOf = wins.groupBy(_._3).view
        .mapValues(_.map(w => (w._1, w._2)).min).toMap
      val want = wins.groupBy(_._1).view.mapValues { ds =>
        (ds.size.toLong,
          ds.count(w => firstOf(w._3) != ((w._1, w._2))).toLong)
      }.toMap
      corpus.foreach { case (id, _) =>
        if (want.contains(id)) assert(got(id) == want(id), s"doc $id win=$win")
        else assert(!got.contains(id), s"doc $id should have no windows")
      }
    }
  }

  test("temperatureMixture: matches the order-pinned scalar model exactly") {
    val rnd = new Random(52)
    for (_ <- 1 to Rounds) {
      val strata = ('a' to ('a' + 2 + rnd.nextInt(5)).toChar).map(_.toString)
      val docs = strata.flatMap(s =>
        List.fill(1 + rnd.nextInt(4))((s, 1L + rnd.nextInt(500))))
      val got = graft.sampling.Sampling.temperatureMixture(
          docs.toDF("source", "nt"), $"source", $"nt")
        .as[(String, Long, Long, Double, Double, Double)].collect()
        .map(r => r._1 -> r).toMap
      val total = docs.map(_._2).sum.toDouble
      val p = docs.groupBy(_._1).view.mapValues(_.map(_._2).sum / total).toMap
      // same fold order as the engine: sources ascending, init 0.0
      val sumPa = strata.sorted.foldLeft(0.0)((acc, s) => acc + math.sqrt(p(s)))
      def r6(x: Double) =
        BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      strata.foreach { s =>
        val q = math.sqrt(p(s)) / sumPa
        assert(got(s)._4 == r6(p(s)), s"token_frac $s")
        assert(got(s)._5 == r6(q), s"temp_frac $s")
        assert(got(s)._6 == r6(q / p(s)), s"sample_weight $s")
      }
    }
  }

  test("autoPause: equals the imperative reference fold for arbitrary signals") {
    // Random deltas INCLUDING clamp-active sequences (prefix sums that
    // would run negative) and random error flags — the regime the q52
    // gate's closed-form oracle deliberately avoids. The independent
    // model is a direct transliteration of the reference's
    // pause/resume bookkeeping (thresholds
    // KafkaMirrorMakerConnectorTask.java:96-97).
    import graft.streaming.FlowControl
    val rnd = new Random(54)
    for (_ <- 1 to Rounds) {
      val maxIn = 5L + rnd.nextInt(20)
      val minIn = 1L + rnd.nextInt(maxIn.toInt - 2)
      val signals = (1 to 120).map { i =>
        FlowControl.PartitionSignal(
          partition = s"p${rnd.nextInt(3)}",
          delta = rnd.nextInt(21) - 10L, // negative prefixes possible
          error = rnd.nextInt(12) == 0,
          seq = i.toLong)
      }
      val got = FlowControl.autoPause(signals.toDS(), maxIn, minIn)
        .collect().map(d => (d.partition, d.action, d.inFlight)).toSeq.sorted
      val want = signals.groupBy(_.partition).toSeq.flatMap { case (p, sigs) =>
        var inFlight = 0L; var paused = false
        sigs.sortBy(_.seq).flatMap { e =>
          inFlight = math.max(0L, inFlight + e.delta)
          val shouldPause = e.error || inFlight > maxIn
          if (!paused && shouldPause) { paused = true; Some((p, "PAUSE", inFlight)) }
          else if (paused && !shouldPause && inFlight <= minIn) {
            paused = false; Some((p, "RESUME", inFlight))
          } else None
        }
      }.sorted
      assert(got == want, s"max=$maxIn min=$minIn")
    }
  }

  test("changeHistory: intervals tile each key's log; current = latestState") {
    import graft.streaming.CdcMerge
    val rnd = new Random(55)
    for (_ <- 1 to Rounds) {
      val ops = Seq("INSERT", "UPDATE", "DELETE")
      val log = (1 to 60).map(i =>
        (rnd.nextInt(6).toLong, i.toLong, ops(rnd.nextInt(3)), s"v$i"))
      val df = log.toDF("key", "scn", "opcode", "value")
      val hist = CdcMerge.changeHistory(df, Seq("key"), "scn", "opcode")
        .select($"key", $"scn", $"scn_to", $"is_current")
        .as[(Long, Long, Long, Boolean)].collect()
      // every non-DELETE change appears exactly once with the next
      // change's scn (any opcode) as its upper bound
      val byKey = log.groupBy(_._1)
      hist.foreach { case (k, scn, scnTo, current) =>
        val next = byKey(k).map(_._2).filter(_ > scn).minOption
        assert(scnTo == next.getOrElse(-1L), s"key=$k scn=$scn")
        assert(current == next.isEmpty)
      }
      assert(hist.length == log.count(_._3 != "DELETE"))
      // current rows ARE the latestState collapse
      val currentKeys = hist.filter(_._4).map(r => (r._1, r._2)).toSet
      val collapsed = CdcMerge.latestState(df, Seq("key"), "scn", "opcode")
        .select($"key", $"scn").as[(Long, Long)].collect().toSet
      assert(currentKeys == collapsed)
    }
  }

  test("paddingEfficiency: conserves tokens and never exceeds batch size") {
    val rnd = new Random(53)
    for (_ <- 1 to Rounds) {
      val bs = 2 + rnd.nextInt(6)
      val docs = List.tabulate(40)(i => (i.toLong, 1L + rnd.nextInt(200)))
      val batches = graft.packing.Packing.paddingEfficiency(
          graft.packing.Packing.lengthBuckets(
            docs.toDF("doc_id", "n"), $"doc_id", $"n", bs))
        .as[(Long, Long, Long, Long, Long, Long, Double)].collect()
      assert(batches.map(_._5).sum == docs.map(_._2).sum, "token mass conserved")
      batches.foreach { case (bkt, _, n, padTo, mass, pad, _) =>
        assert(n >= 1 && n <= bs, s"bucket $bkt batch over size")
        assert(pad == n * padTo - mass && pad >= 0L, s"bucket $bkt pad math")
      }
    }
  }

  test("offset codecs: merge inverts split for arbitrary offsets") {
    val rnd = new Random(47)
    for (_ <- 1 to Rounds) {
      // vector shape
      val vec = List.fill(1 + rnd.nextInt(8))(rnd.nextLong().abs).mkString(",")
      assert(graft.sources.VectorOffsetCodec.merge(
        graft.sources.VectorOffsetCodec.split(vec)) == vec)
      // kafka shape — adversarial names: topics containing dashes,
      // DIGIT-suffixed topics ("topic-0" + partition 1 makes the key
      // "topic-0-1", the shape that would be ambiguous if partitions
      // were not digits-only and the split not at the LAST dash), and
      // Kafka's full legal charset (alnum, '.', '_', '-')
      val shapes = List(
        () => s"t${rnd.nextInt(9)}-x${rnd.nextInt(9)}",
        () => s"topic-${rnd.nextInt(10)}",          // digit-suffixed
        () => s"a-${rnd.nextInt(10)}-${rnd.nextInt(10)}",
        () => s"t.${rnd.nextInt(9)}_x-${rnd.nextInt(9)}")
      val topics = List.fill(1 + rnd.nextInt(4))(
        shapes(rnd.nextInt(shapes.size))()).distinct.sorted
      val json = topics.map { t =>
        val parts = (0 to rnd.nextInt(3))
          .map(p => s""""$p":${rnd.nextInt(100000)}""").mkString(",")
        s""""$t":{$parts}"""
      }.mkString("{", ",", "}")
      val split = graft.sources.KafkaOffsetCodec.split(json)
      assert(graft.sources.KafkaOffsetCodec.split(
        graft.sources.KafkaOffsetCodec.merge(split)) == split)
      // no two (topic, partition) pairs may collide onto one component
      // key: partitions are digits-only, so key = topic + '-' + part
      // inverts at the last dash even when the topic ends in "-<n>"
      val pairs = topics.flatMap(t => (0 until 4).map(p => (t, p)))
      val keys = pairs.map { case (t, p) => s"$t-$p" }
      assert(keys.distinct.size == pairs.size,
        s"component-key collision among $pairs")
    }
    // the concrete verdict case: "topic-0" partition 1 and the
    // round-trip of a map whose keys all end in digits
    val m = Map("topic-0-1" -> "77", "topic-0-0" -> "5", "topic-1-1" -> "9")
    assert(graft.sources.KafkaOffsetCodec.split(
      graft.sources.KafkaOffsetCodec.merge(m)) == m)
    assert(graft.sources.KafkaOffsetCodec.merge(m) ==
      """{"topic-0":{"0":5,"1":77},"topic-1":{"1":9}}""")
  }

  test("pausing wrapper: paused components hold, others match the inner advance") {
    import java.nio.file.Files
    val rnd = new Random(48)
    for (_ <- 1 to Rounds) {
      val parts = 2 + rnd.nextInt(5)
      val paused = (0 until parts).filter(_ => rnd.nextBoolean()).toSet
      val pauseFile = Files.createTempFile("graft-prop-pause-", ".txt")
      Files.writeString(pauseFile, paused.mkString(","))
      val inner = new graft.sources.PausableStream(rows = 100, parts = parts,
        batchPer = 10 + rnd.nextInt(30), size = 4, pauseFile = "")
      val wrapped = new graft.sources.PausingMicroBatchStream(inner,
        graft.sources.VectorOffsetCodec, pauseFile.toString)
      val start = graft.sources.VectorOffset(
        IndexedSeq.fill(parts)(rnd.nextInt(50).toLong))
      val innerEnd = inner.latestOffset(start, inner.getDefaultReadLimit)
        .asInstanceOf[graft.sources.VectorOffset]
      val end = wrapped.latestOffset(start, wrapped.getDefaultReadLimit)
        .asInstanceOf[graft.sources.VectorOffset]
      for (p <- 0 until parts) {
        if (paused(p)) assert(end.next(p) == start.next(p),
          s"paused $p advanced: ${start.next(p)} -> ${end.next(p)}")
        else assert(end.next(p) == innerEnd.next(p),
          s"active $p diverged from inner: ${end.next(p)} vs ${innerEnd.next(p)}")
      }
      Files.deleteIfExists(pauseFile)
    }
  }

  test("piiScrub is idempotent: a scrubbed text has zero detections") {
    val rnd = new Random(49)
    val words = Seq("alice@ex.org", "10.0.0.1", "9999999991", "plain",
      "x@y.io,", "172.16.254.3;", "12345", "a.b", "ref:1234567890")
    for (_ <- 1 to Rounds) {
      val txt = List.fill(12)(words(rnd.nextInt(words.size))).mkString(" ")
      val once = graft.text.Text.piiScrub(
        Seq((1L, txt)).toDF("id", "t"), $"id", $"t")
        .as[(Long, Long, Long, Long, String)].head()
      val twice = graft.text.Text.piiScrub(
        Seq((1L, once._5)).toDF("id", "t"), $"id", $"t")
        .as[(Long, Long, Long, Long, String)].head()
      assert(twice == (1L, 0L, 0L, 0L, once._5),
        s"scrub not idempotent on: $txt -> ${once._5}")
    }
  }

  test("admitBands: equals the lower-id-wins model; dup bands never admitted") {
    val rnd = new Random(53)
    import graft.dedup.Dedup
    for (_ <- 1 to Rounds) {
      def bandRows(ids: Seq[Long]) = ids.flatMap(doc =>
        List.fill(1 + rnd.nextInt(3))((doc, rnd.nextInt(3).toLong, rnd.nextInt(6).toLong)))
      val idx = bandRows(1L to 4L)
      val batch = bandRows(10L to 16L)
      val batchDf = batch.toDF("doc", "band", "bh")
      val verdicts = Dedup.indexDedupBatch(idx.toDF("doc", "band", "bh"),
        batchDf, batch.map(_._1).distinct.toDF("doc"))
      val admitted = Dedup.admitBands(batchDf, verdicts)
        .as[(Long, Long, Long)].collect().toSet
      // naive model: clean = no corpus collision; the conservative
      // intra-batch rule then drops any clean doc sharing a (band,bh)
      // with a LOWER-id clean doc
      val clean = batch.map(_._1).distinct.filter { d =>
        !batch.exists { case (bd, b, h) => bd == d &&
          idx.exists { case (_, cb, ch) => cb == b && ch == h } }
      }.toSet
      val keep = clean.filter { d =>
        !batch.exists { case (bd, b, h) => bd == d &&
          batch.exists { case (od, ob, oh) =>
            clean(od) && od < d && ob == b && oh == h } }
      }
      assert(admitted == batch.filter(r => keep(r._1)).toSet,
        "admitBands diverged from the lower-id-wins model")
      // a flagged dup never contributes bands, and the admitted set is
      // pairwise band-disjoint (so the index invariant is preserved)
      assert(admitted.forall(r => clean(r._1)))
      assert(admitted.groupBy(r => (r._2, r._3)).forall(_._2.map(_._1).size == 1),
        "two admitted docs share a (band,bh)")
    }
    // the named contract: two same-band clean copies in ONE batch
    // admit exactly one — the lower id
    val pair = Seq((9L, 0L, 99L), (7L, 0L, 99L))
    val v = Dedup.indexDedupBatch(
      Seq((1L, 2L, 5L)).toDF("doc", "band", "bh"),
      pair.toDF("doc", "band", "bh"), Seq(7L, 9L).toDF("doc"))
    assert(Dedup.admitBands(pair.toDF("doc", "band", "bh"), v)
      .as[(Long, Long, Long)].collect().toSet == Set((7L, 0L, 99L)))
  }

  test("admitBands: corpus-clean admission is invariant across batch splits") {
    val rnd = new Random(54)
    import graft.dedup.Dedup
    for (_ <- 1 to Rounds) {
      // each doc owns UNIQUE bands (no intra-batch sharing), a random
      // subset colliding with the corpus — the admitted set must be
      // exactly the non-colliding docs for EVERY split and order
      val docs = (10L to 17L).toList
      val contaminated = docs.filter(_ => rnd.nextBoolean()).toSet
      val idx = contaminated.toSeq.map(d => (d - 100L, d * 10 + 1, 0L))
      val batch = docs.flatMap(d => Seq((d, d * 10, 0L), (d, d * 10 + 1, 0L)))
      val splits = Seq(
        Seq(docs),
        Seq(docs.take(4), docs.drop(4)),
        Seq(docs.drop(4), docs.take(4)),
        Seq(docs.drop(5), docs.take(2), docs.slice(2, 5)))
      val results = splits.map { parts =>
        var index = idx.toDF("doc", "band", "bh")
        parts.foreach { part =>
          val sub = batch.filter(r => part.contains(r._1)).toDF("doc", "band", "bh")
          val verd = Dedup.indexDedupBatch(index, sub, part.toDF("doc"))
          index = index.union(Dedup.admitBands(sub, verd))
        }
        index.filter($"doc" >= 10L).select($"doc").distinct()
          .as[Long].collect().toSet
      }
      val want = docs.toSet -- contaminated
      results.foreach(r => assert(r == want,
        s"split-dependent admission: got $r want $want"))
    }
  }
}
