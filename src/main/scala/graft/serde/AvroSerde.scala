package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, StringType, StructType}

/**
 * Real Avro binary serde for the registry envelope path (T6).
 *
 * The reference serializes events as Avro binary and frames them with
 * MAGIC ‖ md5(schemaId) (AvroMessageEncoderUtil.java:33-51,
 * DatastreamProducerRecord.serializeEvents :71-86); the framing lives
 * in [[graft.functions.Portable.registryFrame]] as pure column
 * expressions, and this object supplies the payload serde itself using
 * Apache Avro's GenericDatumWriter/Reader.
 *
 * Shape: `mapPartitions`, one parsed Schema + reused encoder/decoder
 * per partition — the per-partition-expensive-resource pattern (same
 * as the multimodal codec path). This is a genuine serde boundary, not
 * expressible as built-in column functions, which is the documented
 * carve-out for dropping below the DataFrame API.
 */
object AvroSerde {

  /** An Avro record schema of nullable-free string fields. */
  def stringRecordSchema(name: String, fields: Seq[String]): String = {
    val fs = fields.map(f => s"""{"name":"$f","type":"string"}""").mkString(",")
    s"""{"type":"record","name":"$name","fields":[$fs]}"""
  }

  /**
   * Avro-binary-encode the given string columns of every row into a
   * new binary column `outCol` (record schema = `schemaJson`, field
   * order = `fields`).
   */
  def encode(df: DataFrame, schemaJson: String, fields: Seq[String],
      outCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema.add(outCol, BinaryType)
    val idx = fields.map(inSchema.fieldIndex)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val writer = new GenericDatumWriter[GenericRecord](schema)
      val bos = new ByteArrayOutputStream()
      var encoder = EncoderFactory.get().binaryEncoder(bos, null)
      rows.map { r =>
        bos.reset()
        encoder = EncoderFactory.get().binaryEncoder(bos, encoder)
        val rec = new GenericData.Record(schema)
        fields.indices.foreach(i => rec.put(fields(i), r.getString(idx(i))))
        writer.write(rec, encoder)
        encoder.flush()
        Row.fromSeq(r.toSeq :+ bos.toByteArray)
      }
    }(Encoders.row(outSchema))
  }

  /**
   * Decode Avro binary payloads in `inCol` back into string columns
   * `dec_<field>`. A payload that fails to decode yields nulls for
   * every decoded field — the skip-on-serde-error signal (F6,
   * EventProducer.java:322-338) counted by the caller via
   * `Filters.decodedOk`.
   */
  def decode(df: DataFrame, schemaJson: String, fields: Seq[String],
      inCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = fields.foldLeft(inSchema)((s, f) => s.add(s"dec_$f", StringType))
    val binIdx = inSchema.fieldIndex(inCol)
    df.mapPartitions { rows =>
      val schema = new Schema.Parser().parse(schemaJson)
      val reader = new GenericDatumReader[GenericRecord](schema)
      rows.map { r =>
        val decoded: Seq[Any] =
          try {
            val bytes = r.getAs[Array[Byte]](binIdx)
            val dec = DecoderFactory.get().binaryDecoder(bytes, null)
            val rec = reader.read(null, dec)
            // a trailing-garbage payload is not a valid record
            if (!dec.isEnd) fields.map(_ => null)
            else fields.map(f => String.valueOf(rec.get(f)))
          } catch { case _: Exception => fields.map(_ => null) }
        Row.fromSeq(r.toSeq ++ decoded)
      }
    }(Encoders.row(outSchema))
  }
}
