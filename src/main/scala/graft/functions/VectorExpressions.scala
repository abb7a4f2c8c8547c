package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/**
 * Codegen'd dot product over two `array<double>` columns.
 *
 * The naive formulation — `aggregate(zip_with(a, b, _*_), 0d, _+_)` —
 * is an interpreted higher-order function: every pair evaluation walks
 * a lambda interpreter, and whole-stage codegen splits around it. For
 * all-pairs similarity (millions of pairs × dim 64+) that interpreter
 * IS the query cost; this expression compiles to a tight Java loop
 * inside WholeStageCodegen and measured ~10× faster end-to-end.
 *
 * Accumulation order is left-to-right over the array — bit-identical
 * to the sequential fold, so external oracles reproduce the scores.
 */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {

  // Callers pass array<double> (Ann.toDouble casts up front).
  override def dataType: DataType = DoubleType

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      acc += x.getDouble(i) * y.getDouble(i)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  $acc += $a.getDouble($i) * $b.getDouble($i);
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/**
 * Codegen'd signed-hyperplane LSH bucket over an `array<double>`
 * column: bit j of the result is the sign of the projection onto
 * pseudo-random integer hyperplane j, weights
 * `floorMod(j*2654435761 + (i+1)*40503, 2001) - 1000`.
 *
 * The column formulation (`aggregate(transform(v, ...))` per plane)
 * walks the interpreted lambda evaluator nBits times per row and
 * splits whole-stage codegen; this expression computes every plane in
 * ONE pass over the array inside generated code. Accumulation per
 * plane is the same left-to-right fold over elements, so results are
 * bit-identical to the column form (and to the DuckDB oracle).
 */
case class LshBucket(child: Expression, nBits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType

  private def weight(j: Int, i: Int): Long =
    java.lang.Math.floorMod(j.toLong * 2654435761L + (i + 1).toLong * 40503L, 2001L) - 1000L

  override def nullSafeEval(a: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val n = x.numElements()
    val acc = new Array[Double](nBits)
    var i = 0
    while (i < n) {
      val v = x.getDouble(i)
      var j = 0
      while (j < nBits) { acc(j) += v * weight(j, i); j += 1 }
      i += 1
    }
    var bucket = 0L
    var j = 0
    while (j < nBits) { if (acc(j) > 0) bucket |= 1L << j; j += 1 }
    bucket
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one scratch buffer per operator instance, not per row
    val acc = ctx.addMutableState("double[]", "lshAcc",
      v => s"$v = new double[$nBits];")
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val v = ctx.freshName("v")
      val w = ctx.freshName("w")
      val b = ctx.freshName("b")
      s"""
         |int $n = $a.numElements();
         |java.util.Arrays.fill($acc, 0.0);
         |for (int $i = 0; $i < $n; $i++) {
         |  double $v = $a.getDouble($i);
         |  for (int $j = 0; $j < $nBits; $j++) {
         |    long $w = java.lang.Math.floorMod(
         |      $j * 2654435761L + ($i + 1L) * 40503L, 2001L) - 1000L;
         |    $acc[$j] += $v * $w;
         |  }
         |}
         |long $b = 0L;
         |for (int $j = 0; $j < $nBits; $j++) {
         |  if ($acc[$j] > 0) $b |= 1L << $j;
         |}
         |${ev.value} = $b;
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object VectorFunctions {
  /** Column API for [[DotProduct]]. */
  def dotProduct(a: Column, b: Column): Column =
    GraftBridge.column(
      DotProduct(GraftBridge.expression(a), GraftBridge.expression(b)))

  /** Column API for [[LshBucket]]. */
  def lshBucket(v: Column, nBits: Int): Column =
    GraftBridge.column(LshBucket(GraftBridge.expression(v), nBits))
}
