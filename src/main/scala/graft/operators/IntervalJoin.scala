package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Interval (range) join: for each probe row, every candidate row with
 * the same key whose timestamp falls in `(probe.ts, probe.ts + window]`
 * — the "what happened in the N hours after X" query behind attribution
 * and error-correlation analyses over an event log (the reference keeps
 * event-time metadata per record for exactly this kind of downstream
 * correlation, reference `datastream-common/src/main/java/com/linkedin/
 * datastream/common/BrooklinEnvelopeMetadataConstants.java:26-44`).
 *
 * Scale shape: a raw `a.ts < b.ts AND b.ts <= a.ts + w` predicate gives
 * Spark nothing to hash on — the plan degenerates to a broadcast
 * nested-loop / cartesian product, O(|probes|·|candidates|) at 100 TB.
 * Bucketizing by the window length restores an EQUI-join: a candidate
 * lands in bucket ⌊ts/w⌋; any probe whose follow-window reaches it is
 * in the same or the previous bucket, so exploding each probe to
 * (bucket, bucket+1) and equi-joining on (key, bucket) meets every
 * qualifying pair exactly once (the candidate's bucket is unique), and
 * the residual range filter runs post-join on only same-key,
 * adjacent-bucket pairs. Shuffle keys carry the time dimension, so
 * skew stays bounded by events-per-key-per-window, not per-key.
 */
object IntervalJoin {

  /**
   * Probe/candidate frames must both carry `keyCol` and a timestamp
   * `tsCol`; all other columns pass through prefixed `p_` / `c_`.
   * Output: one row per qualifying (probe, candidate) pair with
   * `gap_us = candidate.ts − probe.ts` in microseconds (0, window].
   */
  def intervalJoin(probes: DataFrame, candidates: DataFrame, keyCol: String,
      tsCol: String, windowMicros: Long): DataFrame = {
    require(windowMicros > 0, "windowMicros must be positive")
    val p = probes.columns.foldLeft(probes)((df, c) => df.withColumnRenamed(c, s"p_$c"))
      .withColumn("p_us", unix_micros(col(s"p_$tsCol")))
      .withColumn("bucket",
        explode(array(expr(s"p_us div ${windowMicros}L"),
          expr(s"p_us div ${windowMicros}L + 1L"))))
    val c = candidates.columns.foldLeft(candidates)((df, cc) => df.withColumnRenamed(cc, s"c_$cc"))
      .withColumn("c_us", unix_micros(col(s"c_$tsCol")))
      .withColumn("bucket", expr(s"c_us div ${windowMicros}L"))
    p.join(c,
        col(s"p_$keyCol") === col(s"c_$keyCol") &&
          p("bucket") === c("bucket") &&
          col("c_us") > col("p_us") &&
          col("c_us") <= col("p_us") + windowMicros)
      .withColumn("gap_us", col("c_us") - col("p_us"))
      .drop("bucket", "p_us", "c_us")
  }
}
