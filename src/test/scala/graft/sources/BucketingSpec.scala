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

  private def withConf[A](kvs: (String, String)*)(f: => A): A = {
    val old = kvs.map { case (k, _) => k -> spark.conf.getOption(k) }
    kvs.foreach { case (k, v) => spark.conf.set(k, v) }
    try f finally old.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
