package graft.sketch

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Probabilistic-sketch operators for 100 TB-scale corpus statistics:
 * count-min frequency estimation and Bloom-filter membership
 * pre-filtering — the sublinear-memory answers to "how often does
 * this token occur" and "have we seen this shingle" when exact
 * tables no longer fit. Every hash goes through the portable
 * (md5-derived) [[Portable.hash64]], so both sketches are fully
 * deterministic and reproduce bit-for-bit in any engine — which is
 * also what makes them mergeable across partitions and days.
 */
object Sketch {

  /** Lane-i cell of `value` in a width-`w` count-min row:
    * pmod(hash64("i:" ‖ value), w). */
  def cmsCell(lane: Int, value: Column, w: Int): Column =
    pmod(Portable.hash64(concat(lit(s"$lane:"), value)), lit(w.toLong))

  /**
   * Build a count-min sketch over a value column: `d` independent
   * hash lanes × `w` cells, each cell the count of values hashing
   * into it. The sketch is d·w rows regardless of corpus size — a
   * partial-agg groupBy collapses each partition's stream map-side,
   * so the shuffle carries at most d·w rows per task. Returned
   * relational ((lane, cell) → n), the mergeable form: sketches of
   * two corpora union+sum into the sketch of their concatenation.
   */
  def countMinBuild(values: DataFrame, value: Column, d: Int, w: Int): DataFrame = {
    val lanes = explode(array((0 until d).map(lit): _*)).as("lane")
    values.select(value.as("v"), lanes)
      .select(col("lane"),
        // lane is a column here; inline the affine form per lane via
        // a chained when — d is small (2-8), stays one projection
        (0 until d).foldLeft(lit(-1L)) { (acc, i) =>
          when(col("lane") === i, cmsCell(i, col("v"), w)).otherwise(acc)
        }.as("cell"))
      .groupBy(col("lane"), col("cell"))
      .agg(count(lit(1)).as("n"))
  }

  /**
   * Point-query the sketch for each probe value: estimate = min over
   * lanes of the probed cell (the classic CMS upper bound — never
   * undercounts, overcounts only on collisions). The probe side
   * computes its d cells in a projection and equi-joins the tiny
   * (d·w-row) sketch on (lane, cell); AQE broadcasts it. The join is
   * LEFT with the missing count coalesced to 0 so a probe whose cell
   * was never touched in some lane takes the true CMS min of 0 (and
   * a never-inserted probe still yields a cms_n=0 row) instead of
   * vanishing or reading only its colliding lanes.
   */
  def countMinQuery(sketch: DataFrame, probes: DataFrame, value: Column,
      d: Int, w: Int): DataFrame = {
    val cells = probes.select(value.as("v"))
      .select(col("v"), posexplode(
        array((0 until d).map(i => cmsCell(i, col("v"), w)): _*))
        .as(Seq("lane", "cell")))
    cells.join(sketch, Seq("lane", "cell"), "left")
      .groupBy(col("v"))
      .agg(min(coalesce(col("n"), lit(0L))).as("cms_n"))
  }

  /** Lane-i bit position of `value` in an `m`-bit Bloom filter. */
  def bloomBit(lane: Int, value: Column, m: Int): Column =
    pmod(Portable.hash64(concat(lit(s"$lane:"), value)), lit(m.toLong))

  /**
   * Build a Bloom filter over a value column as the relation of SET
   * bit positions (k hash lanes per value, deduplicated). At most
   * `m` rows regardless of corpus size; the distinct is a partial-agg
   * groupBy. Union-distinct of two builds = the filter of the union.
   */
  def bloomBuild(values: DataFrame, value: Column, k: Int, m: Int): DataFrame =
    values.select(value.as("v"))
      .select(explode(array((0 until k).map(i => bloomBit(i, col("v"), m)): _*))
        .as("bit"))
      .distinct()

  /**
   * Probe the filter: a value tests positive iff all k of its bits
   * are set (true membership always positive; collisions give a
   * bounded false-positive rate). Left-joins the bit relation on the
   * bit position — an equi-join against at most m rows. Probes are
   * deduplicated first: a duplicated probe value would otherwise
   * contribute 2k matched bit rows and fail the count===k test, so
   * the contract holds for any caller, not just distinct inputs.
   */
  def bloomProbe(bloom: DataFrame, probes: DataFrame, value: Column,
      k: Int, m: Int): DataFrame = {
    val bits = probes.select(value.as("v")).distinct()
      .select(col("v"), explode(
        array((0 until k).map(i => bloomBit(i, col("v"), m)): _*)).as("bit"))
    bits.join(bloom.withColumn("set", lit(1L)), Seq("bit"), "left")
      .groupBy(col("v"))
      .agg((count(col("set")) === k).as("bloom_positive"))
  }

  /** HyperLogLog precision: p=8 → m=256 registers (standard error
    * 1.04/√m ≈ 6.5%). The [[Portable.hash64]] value is 32 bits of
    * md5, so the rho space is the remaining 32−8 = 24 bits and
    * rho ∈ [1, 25]. */
  val HllP = 8
  val HllM: Int = 1 << HllP // 256

  /**
   * Per-group HyperLogLog register table over a value column:
   * `groupCols ++ (reg → max rho)` — the register index is the low
   * [[HllP]] bits of the portable hash, rho the leading-zero count
   * (+1) of the remaining 24 bits, computed EXACTLY in integer
   * arithmetic (`bin()` bit length, the p03 idiom — no FP log2 whose
   * rounding could differ between engines at powers of two).
   *
   * Scale shape: one pass over the values, a two-level partial agg
   * (map-side max per (group, reg) combines before the shuffle), and
   * the result is ≤ |groups|·m rows REGARDLESS of corpus size — the
   * whole point of the sketch at 100 TB. Duplicated values land in
   * the same register with the same rho, so the build needs no
   * distinct. Mergeable: register tables of two corpora union +
   * groupBy-max into the register table of their concatenation
   * (max is idempotent AND commutative, so replaying a batch — the
   * s22 streaming crash case — is a natural no-op, no epoch markers
   * needed for the state).
   */
  def hllRegisters(values: DataFrame, value: Column,
      groupCols: Seq[Column] = Nil): DataFrame = {
    val h = Portable.hash64(value)
    val w2 = shiftright(h, HllP) // remaining 24 bits, exact
    val rho = when(w2 === 0L, lit((32 - HllP + 1).toLong))
      .otherwise(lit((32 - HllP + 1).toLong) - length(bin(w2)))
    val keyed = values.select(groupCols :+ pmod(h, lit(HllM.toLong)).as("reg")
      :+ rho.as("rho"): _*)
    keyed.groupBy(col("reg") +: groupCols.indices.map(i => keyed.columns(i))
      .map(col): _*)
      .agg(max(col("rho")).as("mj"))
  }

  /**
   * Collapse a register table to one estimate row per group:
   * `(groupCols..., n_regs, hll_est)` — the raw HLL estimate
   * αm·m²/Z with the small-range linear-counting correction
   * (E ≤ 2.5m and empty registers present → m·ln(m/V)).
   *
   * Cross-engine determinism, term by term: every 2^−Mj is an exact
   * power of two, so the harmonic sum Z is EXACT in binary FP (≤ m
   * dyadic terms spanning < 53 bits — no rounding, no order
   * sensitivity); αm is derived from integer literals by correctly
   * rounded IEEE ops (never a decimal literal, which DuckDB types as
   * DECIMAL and rounds through a different intermediate); the final
   * ln sits under a round(·, 4) that absorbs last-ulp libm drift.
   *
   * Usable cardinality range: the registers are built from a 32-BIT
   * hash ([[hllRegisters]]), and only the small-range (linear
   * counting) correction is applied — there is NO large-range
   * (2^32) correction. Estimates are within the standard ±6.5%
   * up to ~10^8 distinct values; beyond ~2^32/30 ≈ 1.4·10^8, hash
   * collisions in the 32-bit space bias the raw estimate LOW, and the
   * bias grows silently toward 2^32. Callers sizing 100 TB dedup
   * indexes (10^9+ keys) must shard the sketch (e.g. group by a key
   * prefix and sum the per-group estimates) or move to a 64-bit-hash
   * register split; this function intentionally keeps the 32-bit
   * form because the DuckDB oracle mirrors it bit for bit.
   */
  def hllEstimate(registers: DataFrame, groupCols: Seq[String] = Nil): DataFrame = {
    val m = HllM.toDouble
    // α_256 = 0.7213/(1 + 1.079/256), built from integer literals
    val alpha = lit(7213).cast("double") / 10000 /
      (lit(1) + lit(1079).cast("double") / 1000 / HllM)
    val grouped =
      if (groupCols.isEmpty) registers.groupBy()
      else registers.groupBy(groupCols.map(col): _*)
    val agg = grouped.agg(
      // coalesce: an EMPTY register table (global groupBy of nothing)
      // is all-registers-empty — z_hit 0, V = m, estimate exactly 0
      coalesce(sum(lit(1.0) /
          expr("cast(shiftleft(cast(1 as bigint), cast(mj as int)) as double)")),
        lit(0.0)).as("z_hit"),
      count(lit(1)).as("n_regs"))
    val v = lit(HllM.toLong) - col("n_regs")
    val eRaw = alpha * lit(m * m) / (col("z_hit") + v.cast("double"))
    agg.select(groupCols.map(col) ++ Seq(
      col("n_regs"),
      round(when(eRaw <= m * 2.5 && v > 0L,
        lit(m) * log(lit(m) / v.cast("double"))).otherwise(eRaw), 4)
        .as("hll_est")): _*)
  }
}
