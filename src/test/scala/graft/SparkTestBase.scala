package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (one JVM, getOrCreate). */
trait SparkTestBase extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // A full battery runs hundreds of suites through ONE session; the
    // default 10k-capacity async listener queues can fill under that
    // load and Spark DROPS events when they do. A dropped
    // SQLExecutionEnd is how an Observation.future never completes —
    // the exact shape of the once-per-battery deadline-poll flake in
    // the manager/REST suites (r17 PipelineManagerSpec, r18
    // ManagementServerSpec): the polled counter rides a listener
    // event, so one dropped event = one 60 s timeout that passes
    // standalone. 10x headroom makes a drop effectively impossible.
    .config("spark.scheduler.listenerbus.eventqueue.capacity", "100000")
    .getOrCreate()

  def sf(dir: String = "0.001"): String = s"/root/testdata/sf$dir"
}
