package graft.functions

import org.apache.spark.sql.{Column, GraftBridge}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/**
 * Codegen'd Unicode normalization (UAX #15) of a string column — the
 * canonicalization pass a training-data pipeline runs BEFORE dedup,
 * fingerprinting, and tokenization: the same logical text in composed
 * vs decomposed form ("é" vs "e"+U+0301) must shingle and hash
 * identically, or near-dup detection silently misses cross-encoding
 * copies. Spark ships no normalizer builtin; a Scala UDF would box
 * through the encoder per row and split whole-stage codegen — this
 * expression is one static `java.text.Normalizer` call inside the
 * generated code. DuckDB's `nfc_normalize` is the oracle counterpart
 * for form = NFC (both implement UAX #15, so outputs are
 * bit-identical).
 */
case class UnicodeNormalize(child: Expression, form: String)
    extends UnaryExpression {

  require(UnicodeNormalize.Forms.contains(form),
    s"unknown normalization form $form (one of ${UnicodeNormalize.Forms.mkString(",")})")

  override def dataType: DataType = StringType

  override def nullSafeEval(s: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      s.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.valueOf(form)))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = org.apache.spark.unsafe.types.UTF8String.fromString(
         |  java.text.Normalizer.normalize($c.toString(),
         |    java.text.Normalizer.Form.$form));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object UnicodeNormalize {
  val Forms: Seq[String] = Seq("NFC", "NFD", "NFKC", "NFKD")
}

object TextExpressions {
  /** Canonical composition — the dedup-pipeline default. */
  def nfc(c: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), "NFC"))

  /** Compatibility composition (also folds ligatures/width variants —
    * the more aggressive cleanup some corpora need). */
  def nfkc(c: Column): Column =
    GraftBridge.column(UnicodeNormalize(GraftBridge.expression(c), "NFKC"))
}
