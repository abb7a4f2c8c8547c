package graft.model

import org.apache.spark.sql.types._

/**
 * Canonical record envelope of the engine's data plane.
 *
 * Mirrors the reference's change-capture record semantics
 * (reference: datastream-common/.../common/BrooklinEnvelope.java:22-32 —
 * fields previousValue/key/value/metadata/headers; CDC meaning of the
 * fields documented at :16-21), re-expressed as a fixed Spark StructType
 * so Catalyst can prune/push through it.
 *
 * Typed side: `Dataset[Envelope]` for per-record logic; untyped side:
 * [[Envelope.schema]] columns on a DataFrame for declarative pipelines.
 */
final case class Envelope(
    key: Array[Byte],
    value: Array[Byte],
    previousValue: Option[Array[Byte]],
    headers: Map[String, Array[Byte]],
    metadata: Map[String, String])

object Envelope {
  val schema: StructType = StructType(Seq(
    StructField("key", BinaryType),
    StructField("value", BinaryType),
    StructField("previousValue", BinaryType),
    StructField("headers", MapType(StringType, BinaryType)),
    StructField("metadata", MapType(StringType, StringType))
  ))
}

/**
 * Well-known metadata keys + opcodes.
 * Reference: datastream-common/.../BrooklinEnvelopeMetadataConstants.java:19-44.
 */
object EnvelopeMetadata {
  val Opcode = "opcode"
  val OpInsert = "INSERT"
  val OpUpdate = "UPDATE"
  val OpDelete = "DELETE"

  val Scn = "scn"
  val Database = "database"
  val Table = "table"
  val EventTimestamp = "eventTimestamp"
  val SourceTimestamp = "sourceTimestamp"
  val SourcePartition = "sourcePartition"

  // Mirror-source enrichment keys (reference:
  // KafkaMirrorMakerConnectorTask.java:243-278 — origin cluster/topic/
  // partition/offset stamped on every mirrored record).
  val OriginCluster = "kafka-origin-cluster"
  val OriginTopic = "kafka-origin-topic"
  val OriginPartition = "kafka-origin-partition"
  val OriginOffset = "kafka-origin-offset"
}

/**
 * Pipeline spec — the control-plane "query" object.
 * Reference: datastream-common/src/main/pegasus/.../Datastream.pdl:6-97
 * (name, connectorName, transportProviderName, source, status,
 * destination, metadata).
 */
final case class PipelineSpec(
    name: String,
    connector: String,          // source short name: "kafka" | "file" | "directory" | "jdbc" | "rate" | "parquet" | "dirwatch" | "synthetic" | "pausable" | "pausing" (wraps a foreign provider)
    transport: String,          // sink short name: "kafka" | "memory" | "directory" | "parquet" | "noop"
    sourceConnection: String,   // e.g. topic / regex / path / jdbc url
    sourcePartitions: Int = 1,
    destinationConnection: String = "",
    destinationPartitions: Int = 1,
    keySerde: String = "",
    payloadSerde: String = "",
    envelopeSerde: String = "",
    metadata: Map[String, String] = Map.empty,
    status: PipelineStatus.Value = PipelineStatus.Initializing)

/** Reference: Datastream.pdl:50-57 (DatastreamStatus enum). */
object PipelineStatus extends Enumeration {
  val Initializing, Ready, Paused, Deleting, Stopped, Stopping = Value
}
