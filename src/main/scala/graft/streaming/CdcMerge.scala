package graft.streaming

import org.apache.hadoop.fs.Path

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * CDC merge: apply old/new-image change records (T7 envelopes carrying
 * `OpCode {INSERT, UPDATE, DELETE}` + a change sequence number) onto a
 * keyed materialized state table — SURVEY.md §7.3 hard part (2).
 *
 * Reference semantics: BrooklinEnvelope.java:16-21 (key = primary key,
 * value = new image), BrooklinEnvelopeMetadataConstants.java:19-29
 * (opcodes, Scn). The reference only TRANSPORTS these; materializing
 * them is the downstream contract this engine completes.
 *
 * Spark-first shape: last-writer-wins per key by scn is one window
 * rank (or max_by) — partial-agg/shuffle on the key, no driver loop;
 * the streaming form applies the same reduction per micro-batch in
 * `foreachBatch` against a parquet state dir with an atomic
 * write-then-rename swap (Delta's MERGE INTO is the managed-table
 * equivalent).
 */
object CdcMerge {

  /**
   * Collapse a CDC log (key, scn, opcode, value...) to its final
   * state: the highest-scn record per key, dropping keys whose last
   * operation is DELETE.
   */
  def latestState(log: DataFrame, keyCols: Seq[String], scnCol: String,
      opcodeCol: String): DataFrame = {
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col(scnCol).desc)
    log.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1 && col(opcodeCol) =!= "DELETE")
      .drop("__rn")
  }

  /**
   * Apply one micro-batch of changes onto the parquet state at
   * `statePath`: untouched keys survive, changed keys take the batch's
   * final image, DELETEs drop.
   *
   * Crash safety: the new state lands in a scratch dir, the previous
   * state is renamed aside to `.bak`, the scratch dir renamed in, and
   * only then is the backup dropped. A crash at any point leaves
   * either the old state or the backup on disk — [[currentState]]
   * resolves whichever survives, so a replayed micro-batch (Spark's
   * at-least-once foreachBatch contract) re-merges onto intact state
   * instead of an empty table.
   */
  def applyBatch(spark: SparkSession, batch: DataFrame, statePath: String,
      keyCols: Seq[String], scnCol: String, opcodeCol: String): Unit = {
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val state = new Path(statePath)
    val backup = new Path(statePath + ".bak")
    val latest = latestState(batch, keyCols, scnCol, opcodeCol)
    val touched = batch.select(keyCols.map(col): _*).distinct()
    val merged = currentState(spark, statePath) match {
      case Some(existing) =>
        existing.join(touched, keyCols, "left_anti")
          .unionByName(latest.select(existing.columns.map(col): _*))
      case None => latest
    }
    val tmp = new Path(statePath + ".tmp")
    merged.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    fs.delete(backup, true)
    if (fs.exists(state)) fs.rename(state, backup)
    fs.rename(tmp, state)
    fs.delete(backup, true)
  }

  /** The live state: the main dir, or the backup if a crash happened
    * between the two swap renames. */
  def currentState(spark: SparkSession, statePath: String): Option[DataFrame] = {
    val fs = new Path(statePath).getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(new Path(statePath))) Some(spark.read.parquet(statePath))
    else if (fs.exists(new Path(statePath + ".bak")))
      Some(spark.read.parquet(statePath + ".bak"))
    else None
  }
}
