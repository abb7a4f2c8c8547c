package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Predicate/filter operators. All are plain `Column` predicates so
 * Catalyst pushes them into the scan (parquet PushedFilters / JDBC
 * WHERE) — at 100 TB these run inside the source, not after it.
 */
object Filters {

  /**
   * Hash-shard predicate (F3): deterministic row sharding for parallel
   * snapshot reads — `hash(concat(keys)) mod P ∈ assigned`.
   * Reference: MySqlChunkedQueryManager.java:23-56 pushes
   * `MOD(CRC32(CONCAT(k1..kn)), P) IN (...)` into the source SQL.
   * Portable hash (md5-based) instead of CRC32 so the oracle agrees.
   */
  def hashShard(keys: Seq[Column], numShards: Int, assigned: Seq[Int]): Column =
    pmod(Portable.hash64(concat_ws("|", keys: _*)), lit(numShards.toLong))
      .isin(assigned.map(_.toLong): _*)

  /**
   * Composite-key seek predicate (F4): resume a keyed scan strictly
   * after the last-seen composite key:
   * (k1 > v1) OR (k1 = v1 AND k2 > v2) OR ...
   * Reference: MySqlChunkedQueryManager.java:58-70 (predicate),
   * :110-134 (bind order).
   */
  def seekAfter(keys: Seq[Column], lastSeen: Seq[Any]): Column = {
    require(keys.nonEmpty && keys.length == lastSeen.length)
    keys.indices.map { i =>
      val eqPrefix = (0 until i).map(j => keys(j) === lit(lastSeen(j)))
      (eqPrefix :+ (keys(i) > lit(lastSeen(i)))).reduce(_ && _)
    }.reduce(_ || _)
  }

  /**
   * Topic whitelist regex (F1): only records whose topic matches the
   * subscription pattern enter the stream.
   * Reference: KafkaMirrorMakerConnectorTask.java:233.
   */
  def topicWhitelist(topic: Column, pattern: String): Column = topic.rlike(pattern)

  /**
   * Paused-partition admission filter (F2): drop records of paused
   * source partitions before the sink.
   * Reference: AbstractKafkaBasedConnectorTask.translateAndSendBatch
   * :275-307 (paused/failed checks :280-290).
   */
  def notPaused(topicPartition: Column, paused: Seq[String]): Column =
    if (paused.isEmpty) lit(true) else !topicPartition.isin(paused: _*)

  /**
   * TTL expiry (F5): exclude entities past their time-to-live.
   * Reference: Coordinator.isDeletingOrExpired :1398-1432.
   */
  def withinTtl(createdAt: Column, now: Column, ttlMs: Long): Column =
    now.cast("long") < createdAt.cast("long") + lit(ttlMs / 1000L)

  /**
   * Skip-on-decode-error (F6): keep rows whose decode succeeded; count
   * the dropped ones with `observe` at the call site.
   * Reference: EventProducer.java:53-54, :322-338.
   */
  def decodedOk(decoded: Column): Column = decoded.isNotNull

  /**
   * Registry-envelope validity (F6/T6): a framed payload decodes only
   * when its magic byte is 0x00 — the decode-side check of
   * AvroMessageEncoderUtil.decode (first byte must be MAGIC_BYTE).
   */
  def frameOk(frameHex: Column): Column =
    substring(frameHex, 1, 2) === "00"
}
