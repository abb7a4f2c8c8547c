package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Per-record translate/enrich transforms (projection + metadata
 * enrichment). Each is a pure `DataFrame => DataFrame` over columns,
 * so it is testable as a batch query and reusable verbatim under
 * Structured Streaming; all expressions are codegen'd built-ins.
 */
object Translate {

  /**
   * Mirror-source translate: project a Kafka-shaped record
   * (topic, partition, offset, key, value, timestamp) into the
   * envelope, enriching metadata with origin coordinates and deriving
   * the destination topic by `%s` → topic substitution plus optional
   * prefix. Checkpoint string is `topic-partition-offset`.
   *
   * Reference semantics: KafkaMirrorMakerConnectorTask.java:243-278
   * (translate + destination substitution :268-273).
   *
   * Input columns: topic, partition, offset, key, value, ts.
   * Output: envelope columns + destTopic + checkpoint, metadata
   * promoted to flat columns (Catalyst prunes what downstream drops).
   */
  def mirror(df: DataFrame, destinationFormat: String = "%s", topicPrefix: String = ""): DataFrame =
    df.select(
      col("key"),
      col("value"),
      col("topic").as("origin_topic"),
      col("partition").as("origin_partition"),
      col("offset").as("origin_offset"),
      col("ts").as("event_timestamp"),
      // destination = format(destFormat, prefix + topic)
      format_string(destinationFormat, concat(lit(topicPrefix), col("topic"))).as("dest_topic"),
      concat_ws("-", col("topic"), col("partition"), col("offset")).as("checkpoint"),
      // identity partitioning (P1): dest partition = source partition
      // (KafkaMirrorMakerConnectorTask.java:275-277)
      col("partition").as("dest_partition"))

  /**
   * Project a mirrored envelope into the EXACT row contract of the
   * Kafka sink — the columns Spark's kafka writer consumes (`topic`
   * string, `key`/`value` binary, optional `partition` int, `headers`
   * array<struct<key:string,value:binary>>), which is the same record
   * shape the reference's producer path assembles
   * (KafkaTransportProvider.convertToProducerRecord:107-146: topic from
   * the destination, key/value bytes, the source partition carried
   * through for identity partitioning, metadata as headers).
   *
   * Identity partitioning (P1) is preserved by emitting
   * `dest_partition` as the sink's `partition` column — the writer
   * sends each record to the same partition number it came from
   * (KafkaMirrorMakerConnectorTask.java:275-277). Origin coordinates
   * and the checkpoint ride as headers, the reference's metadata
   * passthrough.
   */
  def toKafkaSink(df: DataFrame): DataFrame =
    df.select(
      col("dest_topic").cast("string").as("topic"),
      col("key").cast("binary").as("key"),
      col("value").cast("binary").as("value"),
      col("dest_partition").cast("int").as("partition"),
      array(
        struct(lit("origin-topic").as("key"),
          col("origin_topic").cast("binary").as("value")),
        struct(lit("origin-partition").as("key"),
          col("origin_partition").cast("string").cast("binary").as("value")),
        struct(lit("origin-offset").as("key"),
          col("origin_offset").cast("string").cast("binary").as("value")),
        struct(lit("checkpoint").as("key"),
          col("checkpoint").cast("binary").as("value"))).as("headers"))

  /**
   * Single-topic translate: source timestamp depends on the record's
   * timestamp type (CREATE_TIME uses the broker/producer stamp,
   * otherwise the read time).
   * Reference: KafkaConnectorTask.java:124-155.
   */
  def singleTopic(df: DataFrame, readTime: Column): DataFrame =
    df.withColumn("source_timestamp",
      when(col("timestamp_type") === lit(1), col("ts")).otherwise(readTime))

  /**
   * File line → envelope: key = line number, value = the line,
   * event timestamp = ingestion time.
   * Reference: datastream-file-connector/.../FileProcessor.java:110-135.
   */
  def fileLines(df: DataFrame, lineNo: Column, line: Column, ingestTs: Column): DataFrame =
    df.select(
      lineNo.cast("string").as("key"),
      line.as("value"),
      length(line).cast("long").as("value_len"),
      ingestTs.as("event_timestamp"))

  /**
   * Directory change event → envelope: key = absolute path,
   * value = change kind (CREATED/MODIFIED/DELETED).
   * Reference: datastream-directory/.../DirectoryChangeProcessor.java:128-140.
   */
  def dirEvent(df: DataFrame, path: Column, kind: Column): DataFrame =
    df.select(path.as("key"), kind.as("value"))

  /**
   * Serde projection: frame the payload with the registry envelope
   * (magic byte ‖ md5(schemaId) ‖ payload), hex-encoded.
   * Reference: DatastreamProducerRecord.serializeEvents :71-86 +
   * AvroMessageEncoderUtil.java:42-51.
   */
  def registryFrame(df: DataFrame, schemaId: Column, payload: Column): DataFrame =
    df.withColumn("framed_hex", Portable.registryFrameHex(schemaId, payload))

  /**
   * CDC opcode classification (T7): promote the opcode out of raw
   * change metadata. Reference: BrooklinEnvelope.java:51-72,
   * BrooklinEnvelopeMetadataConstants.java:19-29.
   */
  def opcodeOf(changeKind: Column): Column =
    when(changeKind.isin("create", "insert", "signup"), lit("INSERT"))
      .when(changeKind.isin("delete", "drop", "error"), lit("DELETE"))
      .otherwise(lit("UPDATE"))
}
