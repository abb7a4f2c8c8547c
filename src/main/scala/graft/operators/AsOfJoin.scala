package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Distributed as-of (point-in-time) join: for every left row, attach
 * the latest right row with the same key and time <= the left time.
 *
 * The naive formulation — a range join + per-key top-1 — explodes into
 * |left|·|right-per-key| intermediate rows. This implementation is the
 * scale shape: tag both sides, UNION, one window pass per key ordered
 * by (time, tag) carrying the last non-null right value forward. One
 * shuffle on the key, zero row explosion, any key cardinality — the
 * same merge-sorted sweep a native as-of join performs, expressed in
 * Catalyst operators so AQE/codegen apply.
 *
 * Right rows at the same timestamp as a left row ARE visible to it
 * (tag orders right before left within a timestamp).
 */
object AsOfJoin {

  /**
   * @param left      rows to enrich
   * @param right     lookup stream; must be unique per (key, time) —
   *                  pre-aggregate if not
   * @param key       join key column name (both sides)
   * @param time      event-time column name (both sides)
   * @param rightVals right columns to carry (become nullable on output)
   */
  def latestBefore(left: DataFrame, right: DataFrame, key: String,
      time: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val collisions = rightVals.filter(leftCols.contains) ++
      (if (leftCols.contains("__tag")) Seq("__tag") else Nil)
    require(collisions.isEmpty,
      s"left columns would be overwritten: ${collisions.mkString(", ")}")
    val lTagged = rightVals.foldLeft(
      left.withColumn("__tag", lit(1))) { (df, v) =>
      df.withColumn(v, lit(null).cast(right.schema(v).dataType))
    }
    val rTagged = leftCols.filterNot(c => c == key || c == time).foldLeft(
      right.withColumn("__tag", lit(0))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, last(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 1).drop("__tag")
  }

  /**
   * Forward as-of join: for every left row, attach the EARLIEST right
   * row with the same key and time >= the left time (the "next event
   * after" lookup — e.g. first purchase after a click). Same
   * union+window sweep as [[latestBefore]], mirrored: the window looks
   * forward and right rows sort after left rows within a timestamp, so
   * a right row AT the left row's time is visible to it.
   */
  def earliestAfter(left: DataFrame, right: DataFrame, key: String,
      time: String, rightVals: Seq[String]): DataFrame = {
    val leftCols = left.columns
    val collisions = rightVals.filter(leftCols.contains) ++
      (if (leftCols.contains("__tag")) Seq("__tag") else Nil)
    require(collisions.isEmpty,
      s"left columns would be overwritten: ${collisions.mkString(", ")}")
    val lTagged = rightVals.foldLeft(
      left.withColumn("__tag", lit(0))) { (df, v) =>
      df.withColumn(v, lit(null).cast(right.schema(v).dataType))
    }
    val rTagged = leftCols.filterNot(c => c == key || c == time).foldLeft(
      right.withColumn("__tag", lit(1))) { (df, c) =>
      df.withColumn(c, lit(null).cast(left.schema(c).dataType))
    }
    val unioned = lTagged.unionByName(rTagged.select(lTagged.columns.map(col): _*))
    val w = Window.partitionBy(col(key))
      .orderBy(col(time), col("__tag"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val carried = rightVals.foldLeft(unioned) { (df, v) =>
      df.withColumn(v, first(col(v), ignoreNulls = true).over(w))
    }
    carried.filter(col("__tag") === 0).drop("__tag")
  }
}
