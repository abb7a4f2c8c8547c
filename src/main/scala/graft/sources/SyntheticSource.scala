package graft.sources

import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, ReadMaxRows, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/**
 * Synthetic indexed event source (S8): a DataSource V2
 * MicroBatchStream generating `totalEvents` deterministic events of
 * fixed payload size, at most `batchSize` per micro-batch, RESUMING
 * FROM THE CHECKPOINTED INDEX across restarts — the semantics of the
 * reference's test connector
 * (datastream-testcommon/.../TestEventProducingConnector.java:48,
 * 144-177: indexed events of `eventSize` bytes, `index` restored from
 * the datastream's checkpoint on task (re)assignment).
 *
 * The OFFSET is simply the next event index, so the whole source state
 * lives in Spark's offset log: a restarted query — or the same
 * checkpoint reused with a LARGER totalEvents, the reference's
 * "producer keeps going where it stopped" shape — continues exactly
 * after the last committed index, never duplicating and never
 * skipping. Admission control ([[ReadMaxRows]]) paces batches; the
 * [[SupportsTriggerAvailableNow]] contract lets Trigger.AvailableNow
 * drain up to the run's target in bounded multi-batch runs.
 *
 * Scale shape: generation is pure compute partitioned by index range —
 * `numPartitions` readers each materialize a disjoint slice, nothing
 * is driver-side but the two offsets.
 */
object SyntheticSource {
  val Schema: StructType = StructType(Seq(
    StructField("idx", LongType, nullable = false),
    StructField("payload", StringType, nullable = false)))

  /** Deterministic fixed-size payload: indexed header + 'x' filler.
    * 12 header digits keep the size fixed up to a trillion events —
    * %08d would silently grow the payload past idx 1e8. */
  def payloadFor(idx: Long, size: Int): String =
    f"event-$idx%012d-" + "x" * size
}

/** Offset = the next event index to generate. */
final case class SyntheticOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** `spark.readStream.format(classOf[SyntheticProvider].getName)
  * .option("totalEvents", n)` — the provider entry point. */
final class SyntheticProvider extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    SyntheticSource.Schema
  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    // options arrive with caller-chosen casing — match them the way
    // every Spark source does
    val opts = new CaseInsensitiveStringMap(properties)
    require(opts.containsKey("totalevents"),
      "synthetic source requires option 'totalEvents'")
    val total = opts.getLong("totalevents", 0L)
    new SyntheticTable(total,
      batch = opts.getLong("batchsize", total),
      size = opts.getLong("payloadsize", 64L).toInt,
      parts = opts.getLong("numpartitions", 4L).toInt)
  }
}

final class SyntheticTable(total: Long, batch: Long, size: Int, parts: Int)
    extends Table with SupportsRead {
  require(total >= 0 && batch > 0 && size >= 0 && parts > 0,
    s"invalid synthetic source config: total=$total batch=$batch size=$size parts=$parts")
  override def name(): String = s"synthetic($total)"
  override def schema(): StructType = SyntheticSource.Schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.MICRO_BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = SyntheticSource.Schema
      override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
        new SyntheticStream(total, batch, size, parts)
    }
}

final class SyntheticStream(total: Long, batch: Long, size: Int, parts: Int)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  // AvailableNow pins the drain target at query start; outside that
  // trigger the target is simply the configured total.
  @volatile private var target: Long = total
  override def prepareForTriggerAvailableNow(): Unit = { target = total }

  override def getDefaultReadLimit: ReadLimit = ReadLimit.maxRows(batch)

  override def initialOffset(): Offset = SyntheticOffset(0L)
  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "admission-controlled source: use latestOffset(start, limit)")
  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val s = start.asInstanceOf[SyntheticOffset].n
    val step = limit match {
      case rows: ReadMaxRows => rows.maxRows()
      case _ => batch
    }
    // Never regress below the checkpointed index: a run configured with
    // a SMALLER totalEvents than an earlier run already drained must
    // no-op, not rewind the offset log (a rewound log would duplicate
    // [target, start) on the next larger-total run).
    SyntheticOffset(math.max(s, math.min(s + step, target)))
  }
  override def reportLatestOffset(): Offset = SyntheticOffset(target)

  override def deserializeOffset(json: String): Offset =
    SyntheticOffset(json.toLong)
  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[SyntheticOffset].n
    val e = end.asInstanceOf[SyntheticOffset].n
    if (e <= s) Array.empty
    else {
      // disjoint index slices, one per reader
      val span = e - s
      val per = (span + parts - 1) / parts
      (0 until parts).iterator
        .map(i => (s + i * per, math.min(s + (i + 1) * per, e)))
        .filter { case (lo, hi) => hi > lo }
        .map { case (lo, hi) => SyntheticPartition(lo, hi, size): InputPartition }
        .toArray
    }
  }

  override def createReaderFactory(): PartitionReaderFactory =
    (partition: InputPartition) => {
      val p = partition.asInstanceOf[SyntheticPartition]
      new PartitionReader[InternalRow] {
        private var i = p.lo - 1
        override def next(): Boolean = { i += 1; i < p.hi }
        override def get(): InternalRow = new GenericInternalRow(Array[Any](
          i, UTF8String.fromString(SyntheticSource.payloadFor(i, p.size))))
        override def close(): Unit = ()
      }
    }
}

final case class SyntheticPartition(lo: Long, hi: Long, size: Int)
    extends InputPartition
