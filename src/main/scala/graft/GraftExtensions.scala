package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.types.{BinaryType, LongType, StringType}

import graft.functions.{DotProduct, LshBucket}

/**
 * SparkSessionExtensions entry point: registers the engine's functions
 * in the SQL function registry, so `spark.sql` queries (and any BI tool
 * speaking SQL to this session) can call them directly:
 *
 *   SparkSession.builder.withExtensions(new GraftExtensions)  // code
 *   --conf spark.sql.extensions=graft.GraftExtensions          // config
 *
 *   SELECT graft_dot(a.embedding, b.embedding)      -- codegen'd loop
 *   SELECT graft_hash64(key)                        -- portable shard hash
 *   SELECT graft_registry_frame(schema_id, payload) -- envelope framing
 *
 * Builders construct native Catalyst trees (the same arithmetic as
 * graft.functions.Portable's Column forms), so every function stays
 * inside WholeStageCodegen.
 */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def str(e: Expression) = Cast(e, StringType)

  /** first 8 md5-hex chars parsed base-16 — Portable.hash64. */
  private def hash64(e: Expression): Expression =
    Cast(Conv(Substring(Md5(str(e)), Literal(1), Literal(8)),
      Literal(16), Literal(10)), LongType)

  /** 63-bit two-lane md5 hash — Portable.hash63. */
  private def hash63(e: Expression): Expression = {
    def lane(pos: Int) =
      Cast(Conv(Substring(Md5(str(e)), Literal(pos), Literal(8)),
        Literal(16), Literal(10)), LongType)
    Add(lane(1),
      Multiply(Pmod(lane(9), Literal(2147483648L)), Literal(4294967296L)))
  }

  /** magic byte ‖ md5(schemaId) ‖ payload hex — Portable.registryFrameHex. */
  private def registryFrame(sid: Expression, payload: Expression): Expression =
    Concat(Seq(Literal("00"), Md5(str(sid)),
      Lower(Hex(Cast(payload, BinaryType)))))

  private def fn(name: String, arity: Int)(build: Seq[Expression] => Expression)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) =
    (FunctionIdentifier(name),
      new ExpressionInfo(classOf[GraftExtensions].getName, name),
      (args: Seq[Expression]) => {
        require(args.length == arity, s"$name expects $arity arguments")
        build(args)
      })

  private[graft] def all
      : Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_hash64", 1)(a => hash64(a.head)),
    fn("graft_hash63", 1)(a => hash63(a.head)),
    fn("graft_registry_frame", 2)(a => registryFrame(a(0), a(1))),
    fn("graft_dot", 2)(a => DotProduct(a(0), a(1))),
    // nBits must be statically known: the plane weights are baked into
    // the generated code, exactly like the Column form's Int parameter.
    // Any foldable integral expression qualifies (plain literal, 2+2,
    // CAST(4 AS BIGINT), SMALLINT literals, ...).
    fn("graft_lsh_bucket", 2)(a => a(1) match {
      case e if e.foldable && (e.dataType match {
            case org.apache.spark.sql.types.ByteType |
                 org.apache.spark.sql.types.ShortType |
                 org.apache.spark.sql.types.IntegerType |
                 org.apache.spark.sql.types.LongType => true
            case _ => false
          }) =>
        val v = e.eval() match {
          case i: Int => i.toLong
          case l: Long => l
          case s: Short => s.toLong
          case b: Byte => b.toLong
          case other => throw new IllegalArgumentException(
            s"graft_lsh_bucket nBits evaluated to non-integral $other")
        }
        require(v >= 1 && v <= 63, s"graft_lsh_bucket nBits must be in [1, 63], got $v")
        LshBucket(a(0), v.toInt)
      case other => throw new IllegalArgumentException(
        s"graft_lsh_bucket nBits must be a foldable integer expression, got $other")
    }))

  override def apply(ext: SparkSessionExtensions): Unit =
    all.foreach(ext.injectFunction)
}

object GraftExtensions {
  /** Register into an already-running session's function registry
    * (withExtensions only applies at session construction). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit =
    org.apache.spark.sql.GraftBridge.registerFunctions(spark, new GraftExtensions().all)
}
