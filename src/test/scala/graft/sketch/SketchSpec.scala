package graft.sketch

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class SketchSpec extends SparkTestBase {
  import spark.implicits._

  test("count-min never undercounts and is exact without collisions") {
    val vals = (Seq.fill(5)("a") ++ Seq.fill(3)("b") ++ Seq("c")).toDF("v")
    val sketch = Sketch.countMinBuild(vals, $"v", d = 4, w = 1024)
    val got = Sketch.countMinQuery(sketch, Seq("a", "b", "c").toDF("v"),
        $"v", d = 4, w = 1024)
      .as[(String, Long)].collect().toMap
    // 3 distinct values in 4×1024 cells: no collisions, estimates exact
    assert(got == Map("a" -> 5L, "b" -> 3L, "c" -> 1L))
  }

  test("count-min probe of a never-inserted value reports 0, not a collision") {
    // "zed" was never inserted; a fresh sketch has empty cells in all
    // lanes, so the left-join + coalesce path must yield cms_n = 0 —
    // not drop the probe, and not min over colliding lanes only.
    val sketch = Sketch.countMinBuild(Seq("a", "a", "b").toDF("v"), $"v", 4, 1024)
    val got = Sketch.countMinQuery(sketch, Seq("zed", "a").toDF("v"),
        $"v", d = 4, w = 1024)
      .as[(String, Long)].collect().toMap
    assert(got == Map("zed" -> 0L, "a" -> 2L))
  }

  test("count-min sketches merge by union+sum") {
    val a = Sketch.countMinBuild(Seq("x", "x", "y").toDF("v"), $"v", 2, 64)
    val b = Sketch.countMinBuild(Seq("x", "z").toDF("v"), $"v", 2, 64)
    val merged = a.union(b).groupBy("lane", "cell")
      .agg(sum("n").as("n"))
    val whole = Sketch.countMinBuild(Seq("x", "x", "y", "x", "z").toDF("v"),
      $"v", 2, 64)
    assert(merged.as[(Int, Long, Long)].collect().toSet ==
      whole.as[(Int, Long, Long)].collect().toSet)
  }

  test("bloom filter has no false negatives; non-members test negative here") {
    val members = Seq("alpha", "beta", "gamma", "delta").toDF("v")
    val bloom = Sketch.bloomBuild(members, $"v", k = 3, m = 65536)
    val probes = (Seq("alpha", "beta", "gamma", "delta") ++
      (1 to 50).map(i => s"absent_$i")).toDF("v")
    val got = Sketch.bloomProbe(bloom, probes, $"v", k = 3, m = 65536)
      .as[(String, Boolean)].collect().toMap
    Seq("alpha", "beta", "gamma", "delta").foreach(v =>
      assert(got(v), s"member $v must test positive"))
    // 4 values × 3 bits in 65536: these 50 probes are deterministic
    // non-collisions (everything is md5-derived, stable forever)
    assert((1 to 50).forall(i => !got(s"absent_$i")),
      "tiny filter occupancy must not produce false positives here")
  }

  test("bloom probe is duplicate-safe: a repeated member still tests positive") {
    val members = Seq("alpha", "beta").toDF("v")
    val bloom = Sketch.bloomBuild(members, $"v", k = 3, m = 65536)
    // "alpha" probed three times: without internal dedup the 3k matched
    // bit rows would fail the count===k membership test.
    val probes = Seq("alpha", "alpha", "alpha", "missing").toDF("v")
    val got = Sketch.bloomProbe(bloom, probes, $"v", k = 3, m = 65536)
      .as[(String, Boolean)].collect().toMap
    assert(got("alpha"), "duplicated member must still test positive")
    assert(!got("missing"))
    assert(got.size == 2, "probe output is one row per distinct value")
  }

  test("hll registers match a JVM-side reference implementation") {
    val vals = (1 to 200).map(i => s"item_$i")
    val got = Sketch.hllRegisters(vals.toDF("v"), $"v")
      .as[(Long, Long)].collect().toMap
    val expected = vals
      .map { v =>
        val h = graft.functions.Portable.hash64Of(v)
        val w2 = h >> Sketch.HllP
        val rho = if (w2 == 0L) 25L
          else 25L - (64 - java.lang.Long.numberOfLeadingZeros(w2))
        (h % Sketch.HllM, rho)
      }
      .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
    assert(got == expected)
  }

  test("hll register tables merge by union+max; duplicates are free") {
    val a = Sketch.hllRegisters((1 to 300).map(i => s"v$i").toDF("v"), $"v")
    val b = Sketch.hllRegisters((200 to 500).map(i => s"v$i").toDF("v"), $"v")
    val merged = a.union(b).groupBy("reg").agg(max("mj").as("mj"))
    val whole = Sketch.hllRegisters((1 to 500).map(i => s"v$i").toDF("v"), $"v")
    assert(merged.as[(Long, Long)].collect().toSet ==
      whole.as[(Long, Long)].collect().toSet,
      "merge of overlapping sketches must equal the sketch of the union")
    // idempotence — the s22 crash-replay contract: re-merging a
    // batch already in the table changes nothing
    val replay = whole.union(b).groupBy("reg").agg(max("mj").as("mj"))
    assert(replay.as[(Long, Long)].collect().toSet ==
      whole.as[(Long, Long)].collect().toSet)
  }

  test("hll estimate lands within 3 standard errors at 5000 distinct") {
    val regs = Sketch.hllRegisters(
      (1 to 5000).map(i => s"card_$i").toDF("v"), $"v")
    val est = Sketch.hllEstimate(regs).as[(Long, Double)].collect().head._2
    // σ = 1.04/√256 ≈ 6.5%; 3σ ≈ 19.5%
    assert(math.abs(est - 5000) / 5000.0 < 0.195, s"estimate $est")
  }

  test("hll small-range correction: tiny cardinalities use linear counting") {
    // 10 distinct values, heavily duplicated: registers ignore the
    // duplication entirely, and with V = 246 empty registers the
    // m·ln(m/V) branch is near-exact at this range
    val vals = (1 to 10).flatMap(i => Seq.fill(7)(s"small_$i"))
    val regs = Sketch.hllRegisters(vals.toDF("v"), $"v")
    val Seq((nRegs, est)) =
      Sketch.hllEstimate(regs).as[(Long, Double)].collect().toSeq
    assert(nRegs <= 10, "10 distinct values can hit at most 10 registers")
    assert(math.abs(est - 10.0) < 1.5, s"linear-counting estimate $est")
    val noDup = Sketch.hllRegisters(
      (1 to 10).map(i => s"small_$i").toDF("v"), $"v")
    assert(noDup.as[(Long, Long)].collect().toSet ==
      regs.as[(Long, Long)].collect().toSet,
      "duplication must not move a register")
  }

  test("hll estimate is exact-closed-form on a hand-built register table") {
    // two registers at known mj: Z = 2^-3 + 2^-1 + 254 empty
    val regs = Seq((0L, 3L), (7L, 1L)).toDF("reg", "mj")
    val Seq((nRegs, est)) =
      Sketch.hllEstimate(regs).as[(Long, Double)].collect().toSeq
    assert(nRegs == 2L)
    val alpha = 7213d / 10000 / (1 + 1079d / 1000 / 256)
    val eRaw = alpha * 65536 / (0.125 + 0.5 + 254.0)
    // E ≤ 640 and V = 254 > 0 → linear counting branch
    val expected = BigDecimal(256 * math.log(256.0 / 254))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(eRaw <= 640 && est == expected, s"est $est vs $expected")
  }
}
