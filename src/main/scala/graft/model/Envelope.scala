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

/**
 * Full-fidelity JSON (de)serialization of [[PipelineSpec]] — the wire
 * AND storage shape shared by the REST surface and the manager's
 * durable spec store (the reference serializes the same Datastream
 * record into ZooKeeper and onto the REST wire,
 * ZookeeperBackedDatastreamStore + DatastreamResources). Every field
 * round-trips, including the serde names the REST layer's earlier
 * hand mapping dropped.
 */
object PipelineSpecJson {
  import org.json4s._
  import org.json4s.jackson.JsonMethods

  def toJson(s: PipelineSpec): JValue = JObject(
    "name" -> JString(s.name),
    "connector" -> JString(s.connector),
    "transport" -> JString(s.transport),
    "sourceConnection" -> JString(s.sourceConnection),
    "sourcePartitions" -> JInt(s.sourcePartitions),
    "destinationConnection" -> JString(s.destinationConnection),
    "destinationPartitions" -> JInt(s.destinationPartitions),
    "keySerde" -> JString(s.keySerde),
    "payloadSerde" -> JString(s.payloadSerde),
    "envelopeSerde" -> JString(s.envelopeSerde),
    "metadata" -> JObject(s.metadata.toList.sortBy(_._1)
      .map { case (k, v) => k -> (JString(v): JValue) }),
    "status" -> JString(s.status.toString))

  def fromJson(j: JValue): PipelineSpec = {
    def str(f: String, dflt: String = ""): String =
      j \ f match { case JString(v) => v; case _ => dflt }
    def int(f: String, dflt: Int): Int =
      j \ f match { case JInt(v) => v.toInt; case _ => dflt }
    val md = j \ "metadata" match {
      case JObject(fields) =>
        fields.collect { case (k, JString(v)) => k -> v }.toMap
      case _ => Map.empty[String, String]
    }
    PipelineSpec(
      name = str("name"),
      connector = str("connector"),
      transport = str("transport"),
      sourceConnection = str("sourceConnection"),
      sourcePartitions = int("sourcePartitions", 1),
      destinationConnection = str("destinationConnection"),
      destinationPartitions = int("destinationPartitions", 1),
      keySerde = str("keySerde"),
      payloadSerde = str("payloadSerde"),
      envelopeSerde = str("envelopeSerde"),
      metadata = md,
      status = PipelineStatus.values.find(_.toString == str("status"))
        .getOrElse(PipelineStatus.Initializing))
  }

  def write(s: PipelineSpec): String =
    JsonMethods.compact(JsonMethods.render(toJson(s)))

  /** Storage form: the wire JSON plus a STORE-OWNED monotonic write
    * counter (`specVersion`). The counter is not part of
    * [[PipelineSpec]] — it versions the durable FILE, not the spec
    * (the reference stores the same distinction in the ZK znode's
    * version, never in the Datastream record). Omitted when 0 so the
    * wire form and old files stay readable unchanged. */
  def writeVersioned(s: PipelineSpec, specVersion: Long): String =
    JsonMethods.compact(JsonMethods.render(
      if (specVersion <= 0L) toJson(s)
      else toJson(s) match {
        case JObject(fields) =>
          JObject(fields :+ ("specVersion" -> (JInt(specVersion): JValue)))
        case other => other
      }))

  /** The stored `specVersion` of a persisted spec file's JSON; 0 for
    * wire-form/legacy files that never carried one. */
  def versionOf(json: String): Long =
    JsonMethods.parse(json) \ "specVersion" match {
      case JInt(v) => v.toLong
      case JLong(v) => v
      case _ => 0L
    }

  def read(json: String): PipelineSpec = fromJson(JsonMethods.parse(json))
}
