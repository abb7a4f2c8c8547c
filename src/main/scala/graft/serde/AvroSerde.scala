package graft.serde

import java.io.ByteArrayOutputStream

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{DecoderFactory, EncoderFactory}

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.types.{BinaryType, MapType, StringType, StructType}

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

  /**
   * Decode a MIXED-schema registry-envelope column: each frame's writer
   * schema is resolved at runtime from the md5 digest embedded in its
   * own bytes — no known schema id required (T6 dynamic lookup;
   * reference: AvroMessageEncoderUtil.decode :58-76 slices the digest,
   * SchemaRegistryClient resolves it). Appends two columns:
   *
   *   - `schema_id`: the registered id the digest resolved to, or null
   *   - `dec`: map of the resolved schema's string fields → decoded
   *     values, or null
   *
   * Null in both = the F6 skip signal, raised by a bad magic byte, an
   * unregistered digest, a truncated frame, or an Avro decode failure —
   * the caller counts skips exactly as with the fixed-schema path.
   *
   * Shape: one `mapPartitions` pass; every registered schema is parsed
   * once per partition and its `GenericDatumReader` reused, so a
   * two-schema registry costs two parser calls per partition, not per
   * row. The registry rides the closure (schema-count-sized, the
   * broadcast-table pattern).
   */
  def registryDecode(df: DataFrame, registry: SchemaRegistry,
      inCol: String): DataFrame = {
    val inSchema = df.schema
    val outSchema = inSchema
      .add("schema_id", StringType)
      .add("dec", MapType(StringType, StringType))
    val binIdx = inSchema.fieldIndex(inCol)
    df.mapPartitions { rows =>
      val readers = registry.byDigest.map { case (digest, reg) =>
        val schema = new Schema.Parser().parse(reg.schemaJson)
        digest -> (reg, new GenericDatumReader[GenericRecord](schema))
      }
      val hexChars = "0123456789abcdef".toCharArray
      rows.map { r =>
        val frame = r.getAs[Array[Byte]](binIdx)
        val (sid, dec): (String, Map[String, String]) =
          if (frame == null || frame.length < 17 || frame(0) != 0) (null, null)
          else {
            val sb = new java.lang.StringBuilder(32)
            var i = 1
            while (i <= 16) {
              sb.append(hexChars((frame(i) >> 4) & 0xf))
              sb.append(hexChars(frame(i) & 0xf))
              i += 1
            }
            readers.get(sb.toString) match {
              case None => (null, null)
              case Some((reg, reader)) =>
                try {
                  val d = DecoderFactory.get()
                    .binaryDecoder(frame, 17, frame.length - 17, null)
                  val rec = reader.read(null, d)
                  if (!d.isEnd) (null, null)
                  else (reg.schemaId,
                    reg.fields.map(f => f -> String.valueOf(rec.get(f))).toMap)
                } catch { case _: Exception => (null, null) }
            }
          }
        Row.fromSeq(r.toSeq :+ sid :+ dec)
      }
    }(Encoders.row(outSchema))
  }
}
