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
}
