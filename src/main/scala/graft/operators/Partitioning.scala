package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.functions.Portable

/**
 * Partitioning / distribution operators (P1-P3).
 *
 * At scale, partition assignment is a *column*, not a shuffle: the sink
 * (e.g. Kafka) routes on the `partition` column, so none of these force
 * a Spark exchange unless the caller explicitly co-locates.
 */
object Partitioning {

  /**
   * Identity partitioning (P1): destination partition = source
   * partition. Reference: KafkaMirrorMakerConnectorTask.java:275-277.
   */
  def identity(sourcePartition: Column): Column = sourcePartition

  /**
   * Key-hash partitioning (P2): destination partition = hash(key) mod N
   * — the default Kafka-producer behavior when no explicit partition is
   * set. Reference: KafkaTransportProvider.java:140-145.
   */
  def byKey(key: Column, numPartitions: Int): Column =
    pmod(Portable.hash64(key), lit(numPartitions.toLong))

  /**
   * Broadcast fan-out (P3/K2): replicate each record to every
   * destination partition. Reference: KafkaTransportProvider.broadcast
   * :152-186. Spark shape: explode a partition-id array — narrow (no
   * shuffle), multiplies rows by N only at the sink edge.
   */
  def broadcastFanOut(df: DataFrame, numPartitions: Int): DataFrame =
    df.withColumn("dest_partition",
      explode(sequence(lit(0L), lit(numPartitions - 1L))))

  /**
   * Salted two-phase aggregation — the skew-mitigation pattern for
   * hot grouping keys (a handful of topics carrying most of a 100 TB
   * event log). Phase 1 spreads each hot key over `salts` reducers via
   * a salt derived from a high-cardinality column; phase 2 merges the
   * partials. Results are identical to the direct groupBy (sums/counts
   * are associative); the win is that no single reducer ever sees a
   * whole hot key.
   *
   * `partials` maps each (sum-typed) measure to its phase-1 alias;
   * phase 2 re-sums every alias.
   */
  /**
   * Salted equi-join for a skewed key — the join-side counterpart of
   * [[saltedAgg]]: the fact side gets a salt derived from a
   * high-cardinality column, the (small) build side is replicated once
   * per salt, and the join key becomes (key, salt) — a hot key's rows
   * now land on `salts` reducers instead of one. Result is identical
   * to the plain join; cost is `salts`× the build side, which is the
   * standard trade when AQE's skew handling can't kick in (e.g.
   * pre-AQE stages or deliberately partitioned writes).
   */
  def saltedJoin(fact: DataFrame, build: DataFrame, key: String,
      saltSource: Column, salts: Int): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(Portable.hash64(saltSource), lit(salts.toLong)))
    val replicated = build.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    salted.join(replicated, Seq(key, "__salt")).drop("__salt")
  }

  def saltedAgg(df: DataFrame, groupKey: Column, saltSource: Column,
      salts: Int, partials: Seq[(Column, String)]): DataFrame = {
    val phase1 = df
      .groupBy(groupKey.as("__k"),
        pmod(Portable.hash64(saltSource), lit(salts.toLong)).as("__salt"))
      .agg(partials.head._1.as(partials.head._2),
        partials.tail.map { case (c, n) => c.as(n) }: _*)
    phase1.groupBy(col("__k"))
      .agg(sum(col(partials.head._2)).as(partials.head._2),
        partials.tail.map { case (_, n) => sum(col(n)).as(n) }: _*)
  }
}
