package org.apache.spark.sql

import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.classic.ExpressionUtils

/**
 * Bridge into Spark's private[sql] Column↔Expression converters so the
 * engine can expose custom Catalyst expressions through the public
 * Column API (the supported pattern before Spark split Column from
 * Expression; nothing here touches internals beyond the converters).
 */
object GraftBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Unload every state-store provider loaded on this JVM. Spark's
    * provider cache deliberately retains HDFS-backed state maps after
    * a streaming query stops (fast restart on re-load); in a
    * single-JVM benchmark that ran N checkpointed queries the
    * retained maps become pure heap pressure for whatever runs next.
    * Harnesses call this between streaming gates; a provider that is
    * needed again simply re-loads from its checkpoint. */
  def unloadStateStores(): Unit =
    org.apache.spark.sql.execution.streaming.state.StateStore.unloadAll()

  /** Register SQL functions into a live session's function registry
    * (the post-construction analog of injectFunction). */
  def registerFunctions(
      spark: SparkSession,
      fns: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)]): Unit = {
    val registry = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .sessionState.functionRegistry
    fns.foreach { case (id, info, builder) =>
      registry.registerFunction(id, info, builder)
    }
  }
}
