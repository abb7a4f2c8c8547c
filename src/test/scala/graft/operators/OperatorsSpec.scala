package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Portable

class OperatorsSpec extends SparkTestBase {
  import spark.implicits._

  test("hashShard partitions every row into exactly one of P shards") {
    val df = (1L to 200L).toDF("k")
    val counts = (0 until 4).map { p =>
      df.filter(Filters.hashShard(Seq($"k"), 4, Seq(p))).count()
    }
    assert(counts.sum == 200)
    assert(counts.forall(_ > 20), s"badly skewed shards: $counts")
  }

  test("seekAfter resumes strictly past a composite key") {
    val df = Seq((1, 1), (1, 2), (2, 1), (2, 2), (3, 1))
      .toDF("k1", "k2")
    val got = df.filter(Filters.seekAfter(Seq($"k1", $"k2"), Seq(1, 2)))
      .orderBy($"k1", $"k2").as[(Int, Int)].collect().toSeq
    assert(got == Seq((2, 1), (2, 2), (3, 1)))
  }

  test("mirror translate enriches origin metadata and substitutes destination") {
    val df = Seq(("topicA", 3L, 42L, "K", "V", java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("topic", "partition", "offset", "key", "value", "ts")
    val row = Translate.mirror(df, "dest_%s", "pfx-").collect().head
    assert(row.getAs[String]("dest_topic") == "dest_pfx-topicA")
    assert(row.getAs[String]("checkpoint") == "topicA-3-42")
    assert(row.getAs[Long]("dest_partition") == 3L) // identity partitioning
    assert(row.getAs[String]("origin_topic") == "topicA")
  }

  test("broadcastFanOut replicates each record to every partition") {
    val df = Seq(("a"), ("b")).toDF("key")
    val out = Partitioning.broadcastFanOut(df, 3)
    assert(out.count() == 6)
    assert(out.groupBy("key").count().as[(String, Long)].collect()
      .forall(_._2 == 3))
  }

  test("byKey matches portable hash mod N") {
    val df = Seq("x").toDF("key")
    val p = df.select(Partitioning.byKey($"key", 16)).as[Long].head()
    // md5('x') = 9dd4e461268c8034f5c8564e155c67a6 → 0x9dd4e461 = 2647975009
    assert(p == 2647975009L % 16)
  }

  test("safeCheckpoints: min in-flight minus one, else max acked") {
    val df = Seq(
      (0, 1L, true), (0, 2L, true), (0, 3L, false), (0, 4L, true),
      (1, 1L, true), (1, 2L, true)
    ).toDF("part", "off", "acked")
    val got = Observe.safeCheckpoints(df, $"part", $"off", $"acked")
      .as[(Int, Long)].collect().toMap
    assert(got(0) == 2L) // 3 in flight → safe = 2
    assert(got(1) == 2L) // nothing in flight → max acked
  }

  test("destinationReuse elects the oldest id per source") {
    val df = Seq((1L, "s1"), (2L, "s1"), (3L, "s2")).toDF("id", "src")
    val got = Control.destinationReuse(df, "src", "id")
      .select($"id", $"canonical_id").as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 3L))
  }

  test("stickyAssign keeps previous owners, deals only new tasks") {
    val tasks = Seq("t1", "t2", "t3", "t4").toDF("task")
    val previous = Seq(("t1", 3L), ("t3", 2L)).toDF("task", "instance")
    val got = Control.stickyAssign(tasks, previous, "task", "instance", 2)
      .as[(String, Long)].collect().toMap
    assert(got("t1") == 3L && got("t3") == 2L) // untouched (sticky)
    assert(got("t2") == 0L && got("t4") == 1L) // new: round-robin
  }

  test("loadPack deals partitions round-robin by descending rate") {
    val df = Seq(("a", 100L), ("b", 90L), ("c", 80L), ("d", 70L), ("e", 60L))
      .toDF("part", "rate")
    val got = Control.loadPack(df, $"rate", Seq($"part"), numTasks = 2)
      .select($"part", $"task").as[(String, Long)].collect().toMap
    // rank order a..e → tasks 0,1,0,1,0
    assert(got == Map("a" -> 0L, "b" -> 1L, "c" -> 0L, "d" -> 1L, "e" -> 0L))
  }

  test("lockOwners: first acquire attempt per (task, lease) wins by seq") {
    val attempts = Seq(
      // (task, instance, seq, lease) — i2 attempts first on t1
      ("t1", 9L, 5L, "L1"), ("t1", 2L, 1L, "L1"), ("t1", 7L, 3L, "L1"),
      ("t1", 9L, 8L, "L2"), // new lease window → fresh election
      ("t2", 4L, 2L, "L1"))
      .toDF("task", "inst", "seq", "lease")
    val got = Control.lockOwners(attempts, $"task", $"inst", $"seq", $"lease")
      .select($"task", $"lease_start", $"owner", $"n_contenders")
      .as[(String, String, Long, Long)].collect().toSet
    assert(got == Set(
      ("t1", "L1", 2L, 3L), ("t1", "L2", 9L, 1L), ("t2", "L1", 4L, 1L)))
  }

  test("provisionDestinations resolves the partition-count hierarchy") {
    val specs = Seq(
      ("explicit", Some(16L), Some(8L)), // dest wins over source
      ("fromsrc", None, Some(8L)),       // falls to source partitions
      ("neither", None, None))           // default tier = 1
      .toDF("topic", "dest_p", "src_p")
    val got = Control.provisionDestinations(specs,
        $"topic", $"dest_p", $"src_p")
      .select($"dest_topic", $"partitions", $"replication_factor", $"retention_ms")
      .as[(String, Long, Int, Long)].collect().toSet
    assert(got == Set(
      ("explicit", 16L, 1, 1209600000L),
      ("fromsrc", 8L, 1, 1209600000L),
      ("neither", 1L, 1, 1209600000L)))
  }

  test("broadcastAssign deals tasks round-robin with cross-stream carry") {
    val streams = Seq(("a", 3L), ("b", 2L), ("c", 4L)).toDF("s", "n")
    val got = Control.broadcastAssign(streams, $"s", $"n",
        instances = Seq("i0", "i1", "i2"))
      .as[(String, Long, String)].collect().toSet
    // dealing order (a,0)(a,1)(a,2)(b,0)(b,1)(c,0)(c,1)(c,2)(c,3):
    // the position carries across streams — b starts at i0 only
    // because a consumed a full ring; c starts at i2.
    assert(got == Set(
      ("a", 0L, "i0"), ("a", 1L, "i1"), ("a", 2L, "i2"),
      ("b", 0L, "i0"), ("b", 1L, "i1"),
      ("c", 0L, "i2"), ("c", 1L, "i0"), ("c", 2L, "i1"), ("c", 3L, "i2")))
    // balance: 9 tasks over 3 instances = 3 each
    val perInstance = got.toSeq.groupBy(_._3).view.mapValues(_.size).toMap
    assert(perInstance.values.toSet == Set(3))
  }

  test("startPositions resolves checkpoint > configured > reset strategy") {
    val hw = Seq(
      // (part, earliest, latest, committed, configured, useLatest)
      ("p0", 10L, 100L, Some(42L), None, false),        // checkpoint wins
      ("p1", 10L, 100L, None, Some(7L), true),          // falls to configured
      ("p2", 10L, 100L, None, None, true),              // strategy: latest
      ("p3", 10L, 100L, None, None, false),             // strategy: earliest
      ("p4", 10L, 100L, Some(99L), Some(7L), true))     // checkpoint still wins
      .toDF("part", "earliest", "latest", "committed", "configured", "use_latest")
    val got = Control.startPositions(hw,
        $"committed", $"configured", $"use_latest")
      .select($"part", $"start_offset").as[(String, Long)].collect().toMap
    assert(got == Map(
      "p0" -> 43L, "p1" -> 7L, "p2" -> 100L, "p3" -> 10L, "p4" -> 100L))
  }

  test("taskCountEstimate mirrors the reference estimator's scenarios") {
    // Constants from the reference test: 4 MBps capacity, 90%
    // utilization, default 5 KB/s per unknown partition.
    def estimate(universe: Seq[(String, String)],
        rates: Seq[(String, Long)]): Map[String, (Long, Long, Long)] =
      Control.taskCountEstimate(
          universe.toDF("stream", "part_name"),
          rates.toDF("name", "kb_rate"),
          capacityMBps = 4, utilizationPct = 90, defaultKbRate = 5)
        .as[(String, Long, Long, Long)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

    // Empty assignment -> no output row (the reference's 0 tasks).
    assert(estimate(Nil, Seq("a-0" -> 100L)).isEmpty)

    // One low-throughput partition -> 1 task (ceil of a tiny load).
    val low = estimate(Seq("s" -> "pep-1"), Seq("pep-1" -> 5L))
    assert(low("s") == ((1L, 5L, 1L)))

    // High throughput clamps to the partition count.
    val high = estimate(
      Seq("s" -> "ic-0", "s" -> "ic-1"),
      Seq("ic-0" -> 100000L, "ic-1" -> 100000L))
    assert(high("s") == ((2L, 200000L, 2L)),
      "ceil(200000/3686.4)=55 must clamp to the 2 partitions")

    // Partitions with no info at all take the default weight -> > 0.
    val dflt = estimate(Seq("s" -> "P1", "s" -> "P2"), Nil)
    assert(dflt("s") == ((2L, 10L, 1L)))

    // Topic-level fallback: apple partitions inherit the "apple"
    // topic entry, banana-0 takes the default; heavy topic rate
    // pushes the estimate past the clamp -> 4 (the reference's
    // fruit scenario).
    val fruit = estimate(
      Seq("s" -> "apple-0", "s" -> "apple-1", "s" -> "apple-2", "s" -> "banana-0"),
      Seq("apple" -> 10000L))
    assert(fruit("s") == ((4L, 30005L, 4L)),
      "ceil(30005/3686.4)=9 must clamp to the 4 partitions")

    // Partition-level info wins over the topic-level entry.
    val tiered = estimate(
      Seq("s" -> "apple-0", "s" -> "apple-1"),
      Seq("apple" -> 10000L, "apple-0" -> 7L))
    assert(tiered("s")._2 == 10007L)
  }

  test("frameOk accepts only magic-byte 0x00 frames") {
    val df = Seq("00abcd", "ffabcd").toDF("frame")
    assert(df.filter(Filters.frameOk($"frame")).as[String].collect().toSeq
      == Seq("00abcd"))
  }

  test("saltedAgg equals the direct groupBy") {
    val df = (1L to 500L).map(i => (s"k${i % 3}", i)).toDF("k", "v")
    val direct = df.groupBy($"k")
      .agg(count(lit(1)).as("n"), sum($"v").as("s"))
      .as[(String, Long, Long)].collect().toSet
    val salted = Partitioning.saltedAgg(df, $"k", $"v", salts = 8,
        Seq((count(lit(1)), "n"), (sum($"v"), "s")))
      .select($"__k", $"n", $"s")
      .as[(String, Long, Long)].collect().toSet
    assert(salted == direct)
  }

  test("asof join attaches latest right row at or before left time") {
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ts", "click_id")
    val purchases = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 6L, 902L))
      .toDF("user_id", "ts", "purchase_id")
    val got = AsOfJoin.latestBefore(clicks, purchases, "user_id", "ts",
        Seq("purchase_id"))
      .select($"click_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    // same-ts purchase visible (100→900); later click sees 901;
    // user 2's purchase is after the click → null.
    assert(got == Map(100L -> Some(900L), 101L -> Some(901L), 102L -> None))
  }

  test("forward asof join attaches earliest right row at or after left time") {
    val clicks = Seq((1L, 10L, 100L), (1L, 20L, 101L), (2L, 5L, 102L))
      .toDF("user_id", "ts", "click_id")
    val purchases = Seq((1L, 10L, 900L), (1L, 15L, 901L), (2L, 4L, 902L))
      .toDF("user_id", "ts", "purchase_id")
    val got = AsOfJoin.earliestAfter(clicks, purchases, "user_id", "ts",
        Seq("purchase_id"))
      .select($"click_id", $"purchase_id")
      .as[(Long, Option[Long])].collect().toMap
    // same-ts purchase visible (100→900); click at 20 has nothing
    // after it; user 2's purchase is before the click → null.
    assert(got == Map(100L -> Some(900L), 101L -> None, 102L -> None))
  }

  test("interval join matches the naive range join exactly") {
    val ts = (us: Long) => new java.sql.Timestamp(us / 1000L)
    // user 1: events at 0s, 30s, 90s, 150s; user 2: 0s, 200s
    val rows = Seq((1L, 0L, 10L), (1L, 30L, 11L), (1L, 90L, 12L),
      (1L, 150L, 13L), (2L, 0L, 20L), (2L, 200L, 21L))
      .map { case (u, sec, id) => (id, u, ts(sec * 1000000L)) }
    val df = rows.toDF("event_id", "user_id", "ts")
    // window = 60s: pairs within (t, t+60]
    val got = IntervalJoin.intervalJoin(df, df, "user_id", "ts",
        windowMicros = 60L * 1000000L)
      .select($"p_event_id", $"c_event_id", $"gap_us")
      .as[(Long, Long, Long)].collect().toSet
    val naive = (for {
      (aId, aU, aTs) <- rows
      (bId, bU, bTs) <- rows
      if aU == bU && bTs.getTime > aTs.getTime &&
        bTs.getTime <= aTs.getTime + 60000L
    } yield (aId, bId, (bTs.getTime - aTs.getTime) * 1000L)).toSet
    assert(got == naive)
    // the 30s→90s pair crosses a bucket boundary and must still appear
    assert(got.contains((11L, 12L, 60000000L)))
  }

  test("registry frame is magic byte + md5(schemaId) + payload hex") {
    val df = Seq(("42", "hi")).toDF("sid", "payload")
    val hex = df.select(Portable.registryFrameHex($"sid", $"payload")).as[String].head()
    assert(hex.startsWith("00"))
    assert(hex.length == 2 + 32 + 4) // magic + md5 + 2 utf8 bytes
    assert(hex.endsWith("6869"))     // 'h' 'i'
  }
}
