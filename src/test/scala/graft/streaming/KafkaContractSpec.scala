package graft.streaming

import java.nio.file.Files
import java.util.concurrent.CopyOnWriteArrayList

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Row, SaveMode}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkTestBase
import graft.model.PipelineSpec
import graft.operators.Translate

/**
 * K1 sink row contract, offline-feasible half: the Kafka broker path
 * cannot execute in this environment (no spark-sql-kafka jar,
 * dependency resolution is offline), so this spec drives the mirror
 * pipeline through [[PipelineManager.start]] into a RECORDING transport
 * and asserts the exact row shape the built-in `kafka` transport would
 * hand `batch.write.format("kafka")` — the same contract
 * KafkaTransportProvider.convertToProducerRecord:107-146 consumes:
 * `topic` string, `key`/`value` binary, `partition` int, `headers`
 * array<struct<key:string,value:binary>>. Broker end-to-end remains
 * environment-blocked; everything up to the producer call is covered
 * here under real streaming execution.
 */
class KafkaContractSpec extends SparkTestBase {
  import spark.implicits._

  test("mirror pipeline emits the kafka writer row contract with identity partitioning") {
    val recorded = new CopyOnWriteArrayList[(StructType, Seq[Row])]()
    val hooks = PipelineHooks(transports = Map(
      "recording" -> (_ => (batch, _) =>
        recorded.add((batch.schema, batch.collect().toSeq)))))
    val pm = new PipelineManager(spark,
      Files.createTempDirectory("graft-kc-").toString, hooks)

    val srcDir = Files.createTempDirectory("graft-kc-src-").toString
    Seq(("click", 3, 10L, "k1", "v1"), ("view", 5, 11L, "k2", "v2"))
      .toDF("topic", "partition", "offset", "key", "value")
      .withColumn("ts", to_timestamp(lit("2024-01-01 00:00:00")))
      .write.mode(SaveMode.Append).parquet(srcDir)

    pm.create(PipelineSpec("kc", "parquet", "recording", srcDir,
      destinationConnection = "mirrored-events"))
    pm.start("kc", df =>
      Translate.toKafkaSink(Translate.mirror(df, "mirror.%s", "p-")))
    pm.queryOf("kc").foreach(_.awaitTermination())
    pm.delete("kc")

    val batches = recorded.asScala.toSeq
    assert(batches.nonEmpty, "the streaming epoch must reach the transport")
    val (schema, rows) = batches.head

    // exact writer contract: names, order, and types
    assert(schema.fields.map(_.name).toSeq ==
      Seq("topic", "key", "value", "partition", "headers"))
    assert(schema("topic").dataType == StringType)
    assert(schema("key").dataType == BinaryType)
    assert(schema("value").dataType == BinaryType)
    assert(schema("partition").dataType == IntegerType)
    schema("headers").dataType match {
      case ArrayType(st: StructType, _) =>
        assert(st.fields.map(f => (f.name, f.dataType)).toSeq ==
          Seq(("key", StringType), ("value", BinaryType)))
      case other => fail(s"headers must be array<struct<key,value>>, got $other")
    }

    val byKey = rows.map(r => new String(r.getAs[Array[Byte]]("key"), "UTF-8") -> r).toMap
    assert(byKey.keySet == Set("k1", "k2"))

    // destination substitution + identity partitioning (P1): the sink
    // partition equals the source partition, record for record
    val r1 = byKey("k1")
    assert(r1.getAs[String]("topic") == "mirror.p-click")
    assert(r1.getAs[Int]("partition") == 3)
    assert(new String(r1.getAs[Array[Byte]]("value"), "UTF-8") == "v1")
    val r2 = byKey("k2")
    assert(r2.getAs[String]("topic") == "mirror.p-view")
    assert(r2.getAs[Int]("partition") == 5)

    // headers carry origin coordinates + checkpoint as key->bytes
    val headers = r1.getSeq[Row](r1.fieldIndex("headers"))
      .map(h => h.getAs[String]("key") ->
        new String(h.getAs[Array[Byte]]("value"), "UTF-8")).toMap
    assert(headers == Map(
      "origin-topic" -> "click",
      "origin-partition" -> "3",
      "origin-offset" -> "10",
      "checkpoint" -> "click-3-10"))
    pm.close()
  }
}
