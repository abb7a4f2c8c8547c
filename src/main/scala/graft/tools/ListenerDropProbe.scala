package graft.tools

import java.util.concurrent.TimeUnit
import java.util.concurrent.atomic.AtomicLong

import scala.concurrent.duration.Duration

import org.apache.spark.scheduler.{SparkListener, SparkListenerEvent}
import org.apache.spark.sql.{Observation, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Mechanism probe for the once-per-battery manager/REST-suite flake
 * (r17 PipelineManagerSpec, r18 ManagementServerSpec): both suites
 * deadline-poll a counter that advances when an `Observation.future`
 * completes, and that future completes ONLY when the listener bus
 * delivers the query's SQLExecutionEnd event to ExecutionListenerBus —
 * which rides the SAME "shared" AsyncEventQueue as every
 * addSparkListener listener. Spark's AsyncEventQueue DROPS new events
 * when full (default capacity spark.scheduler.listenerbus.eventqueue
 * .capacity = 10000), so one overloaded moment in a long battery can
 * lose exactly one execution-end event: the Observation never
 * completes, the 60 s poll expires, and the rerun (unloaded) passes.
 *
 * The probe makes the mechanism reproducible ON DEMAND:
 *   mode "default"  — stock 10k queue: a slow shared-queue listener +
 *                     a burst of tiny jobs overflow the queue, the
 *                     observed action's execution-end is dropped at
 *                     post time, and the future NEVER completes even
 *                     after the queue fully drains. EXPECT: DROPPED.
 *   mode "raised"   — capacity 100000 (what SparkTestBase now sets):
 *                     the same flood is merely delayed; the future
 *                     completes once the queue drains. EXPECT:
 *                     COMPLETED.
 *
 * Run:  SPARK_GRAFT_QCAP_MODE=default|raised \
 *         sbt "runMain graft.tools.ListenerDropProbe"
 * Numbers land in PERF_NOTES.md ("round 19: battery-flake mechanism").
 */
object ListenerDropProbe {
  def main(args: Array[String]): Unit = {
    val mode = sys.env.getOrElse("SPARK_GRAFT_QCAP_MODE", "default")
    val builder = SparkSession.builder()
      .master("local[4]")
      .appName(s"graft-qcap-$mode")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
    if (mode == "raised")
      builder.config("spark.scheduler.listenerbus.eventqueue.capacity",
        "100000"): Unit
    val spark = builder.getOrCreate()
    val sc = spark.sparkContext

    // A listener ON THE SHARED QUEUE (addSparkListener registers
    // there — the same queue ExecutionListenerBus shares) whose FIRST
    // event parks the queue's single dispatch thread on a latch: from
    // that moment nothing drains, so the flood below fills the queue
    // to exactly its capacity and every later post is dropped at post
    // time — the deterministic version of "one overloaded moment".
    val gate = new java.util.concurrent.CountDownLatch(1)
    val seen = new AtomicLong()
    sc.addSparkListener(new SparkListener {
      import org.apache.spark.scheduler._
      override def onOtherEvent(event: SparkListenerEvent): Unit = stall()
      override def onJobStart(e: SparkListenerJobStart): Unit = stall()
      override def onJobEnd(e: SparkListenerJobEnd): Unit = stall()
      override def onStageSubmitted(e: SparkListenerStageSubmitted): Unit =
        stall()
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit =
        stall()
      override def onTaskStart(e: SparkListenerTaskStart): Unit = stall()
      override def onTaskEnd(e: SparkListenerTaskEnd): Unit = stall()
      private def stall(): Unit = {
        if (seen.incrementAndGet() == 1L) gate.await()
      }
    })

    // Flood: 3000 ASYNC tiny jobs — ≥6 events each posted against a
    // PARKED dispatcher: ~18k posts vs the 10k default ceiling.
    import org.apache.spark.rdd.RDD.rddToAsyncRDDActions
    val floodStart = System.nanoTime()
    val tiny = sc.parallelize(Seq(1), 1)
    val futures = (1 to 3000).map(_ => tiny.countAsync())
    futures.foreach(f => scala.concurrent.Await.result(f,
      Duration.create(300L, TimeUnit.SECONDS)): Unit)
    val floodS = (System.nanoTime() - floodStart) / 1e9

    // The observed action, posted WHILE the queue sits at its
    // ceiling: its SQLExecutionEnd either drops here (default) or
    // queues (raised).
    val obs = Observation()
    val n = spark.range(100).observe(obs, count(lit(1)).as("n")).count()

    // Release the dispatcher; the queue drains at full speed now. If
    // the execution-end made it INTO the queue, the future completes.
    gate.countDown()
    val waitStart = System.nanoTime()
    val completed =
      try {
        scala.concurrent.Await.ready(obs.future,
          Duration.create(120L, TimeUnit.SECONDS)): Unit
        true
      } catch { case _: java.util.concurrent.TimeoutException => false }
    val waitS = (System.nanoTime() - waitStart) / 1e9

    println(f"[qcap] mode=$mode action_rows=$n flood_s=$floodS%.1f " +
      f"events_seen=${seen.get()} observation_completed=$completed " +
      f"wait_s=$waitS%.1f => ${if (completed) "COMPLETED" else "DROPPED"}")
    spark.stop()
  }
}
