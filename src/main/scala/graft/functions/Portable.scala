package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Deterministic, engine-portable primitives.
 *
 * Every hash here is defined purely in terms of md5-hex + integer
 * arithmetic so an external SQL oracle (DuckDB) computes bit-identical
 * values — that's what makes hash-sharding, MinHash, SimHash and LSH
 * verifiable by the correctness gate instead of "trust me" code.
 *
 * At cluster scale these are all codegen'd Spark built-ins (md5, conv,
 * substring, arithmetic), so the whole pipeline stays inside
 * WholeStageCodegen; for pure-Spark jobs where oracle parity is not
 * needed, xxhash64 is the cheaper drop-in.
 */
object Portable {

  /**
   * 32-bit-range non-negative hash as a long:
   * first 8 hex chars of md5, parsed base-16.
   * DuckDB equivalent: CAST('0x' || substr(md5(x), 1, 8) AS BIGINT).
   */
  def hash64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** SQL fragment computing the identical value in DuckDB. */
  def hash64Sql(expr: String): String =
    s"CAST(CONCAT('0x', SUBSTR(md5(CAST($expr AS VARCHAR)), 1, 8)) AS BIGINT)"

  /** JVM-side evaluation of [[hash64]] on a string — for driver/test
    * code that needs to pre-compute the bucket a value hashes to. */
  def hash64Of(s: String): Long =
    java.lang.Long.parseLong(
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .take(4).map(b => f"$b%02x").mkString, 16)

  /**
   * 63-bit hash: low 32 bits from md5 hex chars 1-8, high 31 bits from
   * chars 9-16. Max value 2^63-1 exactly — safe for signed-64
   * arithmetic in any engine (DuckDB raises on 1<<63, so SimHash uses
   * 63-bit fingerprints).
   */
  def hash63(c: Column): Column = {
    val hexs = md5(c.cast("string"))
    val lo = conv(substring(hexs, 1, 8), 16, 10).cast("long")
    val hi = conv(substring(hexs, 9, 8), 16, 10).cast("long")
    lo + pmod(hi, lit(2147483648L)) * 4294967296L
  }

  def hash63Sql(expr: String): String = {
    val m = s"md5(CAST($expr AS VARCHAR))"
    s"(CAST(CONCAT('0x', SUBSTR($m, 1, 8)) AS BIGINT) + " +
      s"MOD(CAST(CONCAT('0x', SUBSTR($m, 9, 8)) AS BIGINT), 2147483648) * 4294967296)"
  }

  /**
   * Family of k independent hashes: affine transforms of the base hash
   * modulo a Mersenne-ish prime. Standard MinHash construction
   * (Broder '97); coefficients fixed so both engines agree.
   */
  val MinHashPrime: Long = 4294967311L // smallest prime > 2^32

  def affineHash(base: Column, i: Int): Column = {
    val a = 1_000_003L * (i + 1) + 12345L
    val b = 998_244_353L * (i + 1) + 7L
    pmod(base * lit(a) + lit(b), lit(MinHashPrime))
  }

  def affineHashSql(baseExpr: String, i: Int): String = {
    val a = 1_000_003L * (i + 1) + 12345L
    val b = 998_244_353L * (i + 1) + 7L
    // base is non-negative so plain MOD == pmod here.
    s"MOD($baseExpr * $a + $b, ${MinHashPrime})"
  }

  /**
   * Schema-registry envelope framing, hex-string form:
   * MAGIC_BYTE(0x00) ‖ md5(schemaId) ‖ payload.
   * Reference: datastream-common/.../AvroMessageEncoderUtil.java:33,42-51
   * (encode prepends magic byte + 16-byte md5 of the schema id).
   * Hex-string representation keeps the oracle comparison byte-exact.
   */
  def registryFrameHex(schemaId: Column, payload: Column): Column =
    concat(lit("00"), md5(schemaId.cast("string")),
      lower(hex(payload.cast("binary"))))

  def registryFrameHexSql(schemaIdExpr: String, payloadExpr: String): String =
    s"CONCAT('00', md5(CAST($schemaIdExpr AS VARCHAR)), lower(hex(CAST($payloadExpr AS BLOB))))"

  /**
   * Binary registry envelope (T6 wire form): MAGIC_BYTE(0x00) ‖
   * md5(schemaId) (16 raw bytes) ‖ payload — the actual frame the
   * reference produces (AvroMessageEncoderUtil.java:33-51); the hex
   * variant above is its oracle-friendly string projection.
   */
  def registryFrame(schemaId: Column, payload: Column): Column =
    concat(lit(Array[Byte](0)), unhex(md5(schemaId.cast("string"))),
      payload.cast("binary"))

  /** DuckDB expression building the identical BLOB frame. */
  def registryFrameSql(schemaIdExpr: String, payloadExpr: String): String =
    s"('\\x00'::BLOB || unhex(md5(CAST($schemaIdExpr AS VARCHAR))) || " +
      s"CAST($payloadExpr AS BLOB))"

  /**
   * Frame validity (decode precondition): magic byte 0x00 and the
   * 16-byte schema digest matches the expected schema id. Reference:
   * AvroMessageEncoderUtil.decode :58-76 (first byte must be
   * MAGIC_BYTE; the schema is resolved by the embedded digest).
   */
  def registryFrameValid(frame: Column, schemaId: Column): Column =
    octet_length(frame) >= 17 &&
      substring(frame, 1, 1) === lit(Array[Byte](0)) &&
      substring(frame, 2, 16) === unhex(md5(schemaId.cast("string")))

  /** DuckDB boolean for [[registryFrameValid]] (blobs sliced via hex —
    * DuckDB has no blob substring; hex() there is uppercase). */
  def registryFrameValidSql(frameExpr: String, schemaIdExpr: String): String =
    s"(octet_length($frameExpr) >= 17 AND substring(hex($frameExpr), 1, 2) = '00' " +
      s"AND substring(hex($frameExpr), 3, 32) = upper(md5(CAST($schemaIdExpr AS VARCHAR))))"

  /**
   * Decode side of the binary envelope: the payload bytes when the
   * frame checks out, null otherwise — null is the F6 skip signal
   * counted at the call site.
   */
  def registryUnframe(frame: Column, schemaId: Column): Column =
    when(registryFrameValid(frame, schemaId),
      frame.substr(lit(18), octet_length(frame)))

  def registryUnframeSql(frameExpr: String, schemaIdExpr: String): String =
    s"CASE WHEN ${registryFrameValidSql(frameExpr, schemaIdExpr)} " +
      s"THEN unhex(substring(hex($frameExpr), 35)) ELSE NULL END"
}
