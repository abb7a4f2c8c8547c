package graft.sources

import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

import graft.SparkTestBase

/**
 * Scale contract: joining two tables bucketed on the join key must not
 * shuffle either side — the plan-level proof that the pre-partitioning
 * survives to execution (what makes repeated 100 TB joins affordable).
 */
class BucketingSpec extends SparkTestBase {
  import spark.implicits._

  test("bucketed-bucketed join runs with zero shuffle exchanges") {
    val orders = spark.read.parquet(sf() + "/orders.parquet")
    val customer = spark.read.parquet(sf() + "/customer.parquet")
    Bucketing.writeBucketed(orders, "b_orders", "o_custkey", 4)
    Bucketing.writeBucketed(
      customer.withColumn("c_custkey", $"c_custkey".cast("long")),
      "b_customer", "c_custkey", 4)
    try {
      // forbid broadcast so the co-located sort-merge path is exercised
      withConf("spark.sql.autoBroadcastJoinThreshold" -> "-1") {
        val joined = spark.table("b_orders")
          .join(spark.table("b_customer"), $"o_custkey" === $"c_custkey")
          .groupBy($"c_mktsegment").agg(count(lit(1)).as("n"))
        val n = joined.as[(String, Long)].collect().map(_._2).sum
        assert(n == orders.count())
        val shuffles = joined.queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec => e
        }
        // the only exchange allowed is for the final small groupBy —
        // the JOIN itself must read both sides bucket-aligned
        assert(shuffles.size <= 1, s"unexpected shuffles: $shuffles")
      }
    } finally {
      spark.sql("DROP TABLE IF EXISTS b_orders")
      spark.sql("DROP TABLE IF EXISTS b_customer")
    }
  }

  test("partition filter prunes to one directory and leaves no data filter") {
    val dir = java.nio.file.Files.createTempDirectory("graft_part_prune")
      .toFile.getAbsolutePath
    try {
      val orders = spark.read.parquet(sf() + "/orders.parquet")
      Bucketing.writePartitioned(orders, dir, "o_orderpriority")
      val one = spark.read.parquet(dir)
        .filter($"o_orderpriority" === "1-URGENT")
      val scans = one.queryExecution.executedPlan.collect {
        case s: org.apache.spark.sql.execution.FileSourceScanExec => s
      }
      assert(scans.size == 1)
      // The equality predicate must be resolved ENTIRELY at planning
      // time against the directory listing: a partition filter with no
      // residual per-row data filter — whole non-matching directories
      // are never opened.
      assert(scans.head.partitionFilters.exists(_.references.exists(
        _.name == "o_orderpriority")), "filter must prune partitions")
      assert(scans.head.dataFilters.isEmpty,
        "no residual row-level filter — the directory listing decided")
      val expected = orders.filter($"o_orderpriority" === "1-URGENT").count()
      assert(one.count() == expected && expected > 0)
    } finally deleteTree(new java.io.File(dir))
  }

  private def deleteTree(f: java.io.File): Unit = {
    Option(f.listFiles()).foreach(_.foreach(deleteTree))
    f.delete(): Unit
  }

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
