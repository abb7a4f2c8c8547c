package graft.serde

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

/**
 * Digest-addressed schema registry (T6 dynamic lookup).
 *
 * The reference resolves the writer schema of every consumed message at
 * RUNTIME from the 16-byte md5 digest embedded in the envelope — it
 * never assumes a topic carries one known schema (reference:
 * datastream-common/.../SchemaRegistryClient.java — `getSchemaByID`,
 * and AvroMessageEncoderUtil.java:58-76, which slices the digest out of
 * the frame and asks the registry for the schema). This is what lets a
 * mixed-schema topic (e.g. mid-migration, v1 and v2 producers live at
 * once) be consumed by one pipeline.
 *
 * A registry value is immutable and serializable, so it ships inside
 * the `mapPartitions` closure of [[AvroSerde.registryDecode]] to every
 * executor — at cluster scale the registry is a small broadcast-style
 * lookup table (schema count, not data count), exactly like the
 * reference's client-side schema cache.
 *
 * @param byDigest lowercase md5-hex digest of the schema id → schema
 */
final class SchemaRegistry private (
    val byDigest: Map[String, SchemaRegistry.Registered]) extends Serializable {

  /** Register a schema under its id; the wire key is md5(schemaId),
    * matching what [[graft.functions.Portable.registryFrame]] embeds. */
  def withSchema(schemaId: String, schemaJson: String,
      fields: Seq[String]): SchemaRegistry =
    new SchemaRegistry(byDigest + (SchemaRegistry.digestOf(schemaId) ->
      SchemaRegistry.Registered(schemaId, schemaJson, fields)))

  /** Resolve by the lowercase hex digest sliced from a frame. */
  def resolve(digestHex: String): Option[SchemaRegistry.Registered] =
    byDigest.get(digestHex)

  def size: Int = byDigest.size
}

object SchemaRegistry {

  /** One registered writer schema: the id it was published under, its
    * Avro JSON, and the (ordered) string fields it declares. */
  final case class Registered(schemaId: String, schemaJson: String,
      fields: Seq[String]) extends Serializable

  val empty: SchemaRegistry = new SchemaRegistry(Map.empty)

  /** The wire digest of a schema id: lowercase md5-hex over UTF-8
    * bytes — byte-identical to `md5(CAST(id AS STRING))` in Spark and
    * DuckDB, so frames built by column expressions resolve here. */
  def digestOf(schemaId: String): String =
    MessageDigest.getInstance("MD5")
      .digest(schemaId.getBytes(StandardCharsets.UTF_8))
      .map(b => f"${b & 0xff}%02x").mkString
}
