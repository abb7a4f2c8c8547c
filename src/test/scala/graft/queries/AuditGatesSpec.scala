package graft.queries

import java.nio.file.Files

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

import graft.SparkEntry
import graft.SparkTestBase

/**
 * Worst-case contracts of the audit gates — the cases whose entire
 * point is to NOT vanish when the data is at its most broken. The
 * oracle comparison can't cover these (both engines share the blind
 * spot if the contract regresses), so they're pinned on synthetic
 * corpora here.
 */
class AuditGatesSpec extends SparkTestBase {
  import spark.implicits._

  test("e19 reports (not vanishes) on a fully-NaN embedding snapshot") {
    val dir = Files.createTempDirectory("graft-audit-e19-").toString
    Seq(
      (0L, Array(Float.NaN, 1.0f, 2.0f)),
      (1L, Array(0.5f, Float.NaN, 1.5f)),
      (2L, Array(Float.NaN, Float.NaN, Float.NaN)))
      .toDF("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val out = SparkEntry.queries("e19_embedding_health")(spark, dir).collect()
    assert(out.length == 1, "the audit must emit its summary row even " +
      "when every vector is poisoned")
    val r = out.head
    assert(r.getAs[Long]("n_vectors") == 3L)
    assert(r.getAs[Long]("n_nan") == 3L)
    assert(r.getAs[Long]("n_zero") == 0L)
    assert(r.isNullAt(r.fieldIndex("min_norm")) &&
      r.isNullAt(r.fieldIndex("med_norm")) &&
      r.isNullAt(r.fieldIndex("max_norm")),
      "norm envelope must be NULL when no clean vector exists")
  }

  test("e19 mixed corpus: NaN vectors excluded from the norm envelope") {
    val dir = Files.createTempDirectory("graft-audit-e19b-").toString
    Seq(
      (0L, Array(3.0f, 4.0f)),          // norm 5
      (1L, Array(0.0f, 0.0f)),          // zero vector, norm 0
      (2L, Array(Float.NaN, 9999.0f)),  // must not pollute max_norm
      (3L, Array(6.0f, 8.0f)))          // norm 10
      .toDF("vec_id", "embedding")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/embeddings.parquet")
    val r = SparkEntry.queries("e19_embedding_health")(spark, dir).head()
    assert(r.getAs[Long]("n_vectors") == 4L)
    assert(r.getAs[Long]("n_nan") == 1L)
    assert(r.getAs[Long]("n_zero") == 1L)
    assert(r.getAs[Double]("min_norm") == 0.0)
    assert(r.getAs[Double]("med_norm") == 5.0) // lower median of {0,5,10}
    assert(r.getAs[Double]("max_norm") == 10.0)
  }

  test("t21 reports a zero-head-overlap source instead of dropping it") {
    // 'junk' shares NO token with the corpus head (which 'wiki'
    // dominates) — the most-drifted source must still get a row
    val wiki = (0 until 40).map(i =>
      (i.toLong, "the quick brown fox jumps over the lazy dog", "wiki"))
    val junk = Seq((100L, "zzq1 zzq2 zzq3", "junk"))
    val dir = Files.createTempDirectory("graft-audit-t21-").toString
    (wiki ++ junk).toDF("doc_id", "text", "source")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    // shrink the head to exactly wiki's 8 distinct tokens so junk
    // (3 tokens, each count 1) cannot sneak into it on tie-break
    val out = graft.text.Text.sourceDrift(
      spark.read.parquet(s"$dir/documents.parquet"),
      col("source"), col("text"), topN = 8)
      .collect().map(r => r.getString(0) -> ((r.getLong(1),
        Option(r.get(2)).map(_.asInstanceOf[Double])))).toMap
    assert(out.contains("junk"), "zero-overlap source vanished")
    assert(out("junk") == ((0L, None)),
      "zero-overlap source must report n_head=0, NULL kl")
    assert(out("wiki")._1 > 0L && out("wiki")._2.isDefined)
  }

  test("t21 keeps a NULL-keyed source bucket's computed row (null-safe join)") {
    val dir = Files.createTempDirectory("graft-audit-t21n-").toString
    val rows = Seq(
      (0L, "alpha beta gamma alpha", "wiki"),
      (1L, "alpha beta beta", null.asInstanceOf[String]))
    rows.toDF("doc_id", "text", "source")
      .write.mode(SaveMode.Overwrite).parquet(s"$dir/documents.parquet")
    val out = graft.text.Text.sourceDrift(
      spark.read.parquet(s"$dir/documents.parquet"),
      col("source"), col("text"), topN = 3).collect()
    val nullRow = out.find(_.isNullAt(0))
      .getOrElse(fail("NULL-keyed source bucket missing from the audit"))
    assert(nullRow.getLong(1) > 0L,
      "NULL-keyed bucket's head overlap was zeroed — join not null-safe")
    assert(!nullRow.isNullAt(2), "NULL-keyed bucket lost its computed kl")
  }
}
