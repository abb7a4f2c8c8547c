package graft.serde

import org.apache.spark.sql.functions._

import graft.SparkTestBase
import graft.functions.Portable

class AvroSerdeSpec extends SparkTestBase {
  import spark.implicits._

  private val schema = AvroSerde.stringRecordSchema("Envelope", Seq("key", "value"))

  test("encode produces the exact Avro binary wire format") {
    val df = Seq(("a", "b")).toDF("key", "value")
    val bytes = AvroSerde.encode(df, schema, Seq("key", "value"), "avro")
      .select("avro").as[Array[Byte]].head()
    // Avro binary: each string = zigzag varint length then UTF-8 bytes.
    // "a" -> 0x02 0x61, "b" -> 0x02 0x62; record = fields in order.
    assert(bytes.toSeq == Seq[Byte](0x02, 0x61, 0x02, 0x62))
  }

  test("round-trips through the binary registry frame") {
    val df = Seq(("k1", "hello"), ("k2", "wörld")).toDF("key", "value")
    val framed = AvroSerde.encode(df, schema, Seq("key", "value"), "avro")
      .withColumn("frame", Portable.registryFrame(lit(7L), col("avro")))
      .select("key", "frame")
    val back = AvroSerde.decode(
      framed.withColumn("payload", Portable.registryUnframe(col("frame"), lit(7L))),
      schema, Seq("key", "value"), "payload")
    val got = back.select($"dec_key", $"dec_value").as[(String, String)]
      .collect().toSet
    assert(got == Set(("k1", "hello"), ("k2", "wörld")))
  }

  test("registryDecode resolves each row's writer schema from its own digest") {
    val v1 = AvroSerde.stringRecordSchema("V1", Seq("value"))
    val v2 = AvroSerde.stringRecordSchema("V2", Seq("value", "origin"))
    val registry = SchemaRegistry.empty
      .withSchema("s-v1", v1, Seq("value"))
      .withSchema("s-v2", v2, Seq("value", "origin"))
    assert(registry.size == 2)
    assert(registry.resolve(SchemaRegistry.digestOf("s-v1")).get.schemaId == "s-v1")
    assert(registry.resolve("00" * 16).isEmpty)

    // one column, two writer schemas — the mid-migration topic
    val a = AvroSerde.encode(Seq(("r1", "va", "x")).toDF("id", "value", "origin"),
      v1, Seq("value"), "avro")
      .withColumn("frame", Portable.registryFrame(lit("s-v1"), col("avro")))
    val b = AvroSerde.encode(Seq(("r2", "vb", "earth")).toDF("id", "value", "origin"),
      v2, Seq("value", "origin"), "avro")
      .withColumn("frame", Portable.registryFrame(lit("s-v2"), col("avro")))
    // plus an unregistered writer and a tampered frame: both must skip
    val c = AvroSerde.encode(Seq(("r3", "vc", "y")).toDF("id", "value", "origin"),
      v1, Seq("value"), "avro")
      .withColumn("frame", Portable.registryFrame(lit("unknown"), col("avro")))
    val d = AvroSerde.encode(Seq(("r4", "vd", "z")).toDF("id", "value", "origin"),
      v1, Seq("value"), "avro")
      .withColumn("good", Portable.registryFrame(lit("s-v1"), col("avro")))
      .withColumn("frame",
        concat(lit(Array[Byte](1)), expr("substring(good, 2, octet_length(good))")))

    val mixed = a.unionByName(b).unionByName(c)
      .unionByName(d.drop("good")).select("id", "frame")
    val got = AvroSerde.registryDecode(mixed, registry, "frame")
      .select(col("id"), col("schema_id"),
        element_at(col("dec"), "value").as("v"),
        element_at(col("dec"), "origin").as("o"))
      .as[(String, String, String, String)].collect()
      .map(t => t._1 -> ((t._2, t._3, t._4))).toMap
    assert(got("r1") == ("s-v1", "va", null))
    assert(got("r2") == ("s-v2", "vb", "earth"))
    assert(got("r3") == (null, null, null))
    assert(got("r4") == (null, null, null))
  }

  test("bad magic byte fails validation; corrupt payload decodes to nulls (F6)") {
    val df = Seq(("k1", "v1")).toDF("key", "value")
    val framed = AvroSerde.encode(df, schema, Seq("key", "value"), "avro")
      .withColumn("good", Portable.registryFrame(lit(7L), col("avro")))
    // wrong magic: first byte 0x01
    val badMagic = framed.withColumn("frame",
      concat(lit(Array[Byte](1)), expr("substring(good, 2, octet_length(good))")))
    assert(badMagic.select(Portable.registryUnframe(col("frame"), lit(7L)))
      .as[Array[Byte]].head() == null)
    // wrong schema id: digest mismatch
    assert(framed.select(Portable.registryUnframe(col("good"), lit(8L)))
      .as[Array[Byte]].head() == null)
    // valid frame, garbage payload: Avro decode must yield nulls
    val garbage = Seq(Tuple1(Array[Byte](0x7f, 0x7f, 0x7f)))
      .toDF("payload")
    val dec = AvroSerde.decode(garbage, schema, Seq("key", "value"), "payload")
    val row = dec.select($"dec_key", $"dec_value").head()
    assert(row.isNullAt(0) && row.isNullAt(1))
  }
}
