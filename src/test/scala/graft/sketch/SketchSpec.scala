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
}
