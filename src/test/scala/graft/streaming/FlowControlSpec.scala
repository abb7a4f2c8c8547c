package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger

import graft.SparkTestBase
import graft.streaming.FlowControl.{PartitionSignal, PauseDecision}

/**
 * A4/A5 stateful auto-pause: per-partition control loop over
 * flatMapGroupsWithState, fed one micro-batch at a time so transition
 * order is deterministic.
 */
class FlowControlSpec extends SparkTestBase {
  import spark.implicits._

  test("autoPause emits PAUSE on error/overflow and RESUME after drain") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[PartitionSignal]
    val decisions = FlowControl.autoPause(in.toDS(),
      maxInFlight = 10L, minInFlight = 2L)

    val ckpt = Files.createTempDirectory("graft-fc-").toString
    val q = decisions.writeStream
      .queryName("fc_decisions")
      .outputMode("append")
      .format("memory")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.ProcessingTime(0))
      .start()

    def step(sig: PartitionSignal*): Unit = {
      in.addData(sig)
      q.processAllAvailable()
    }
    def got(): Seq[(String, String, Long)] =
      spark.table("fc_decisions").as[PauseDecision].collect().toSeq
        .map(d => (d.partition, d.action, d.inFlight))

    // p0 overflows the max threshold → PAUSE.
    step(PartitionSignal("p0", 11L, error = false, seq = 1L))
    assert(got() == Seq(("p0", "PAUSE", 11L)))

    // Draining but still above min → stays paused, no new decision.
    step(PartitionSignal("p0", -5L, error = false, seq = 2L))
    assert(got().size == 1)

    // Below min → RESUME.
    step(PartitionSignal("p0", -5L, error = false, seq = 3L))
    assert(got().toSet ==
      Set(("p0", "PAUSE", 11L), ("p0", "RESUME", 1L)))

    // Send error pauses regardless of in-flight; p1 independent of p0.
    step(PartitionSignal("p1", 1L, error = true, seq = 4L))
    assert(got().count(_._1 == "p1") == 1)
    assert(got().contains(("p1", "PAUSE", 1L)))

    // Many signals in ONE batch fold in seq order, not arrival order:
    // p2 sees (+11, -10) → PAUSE at 11 then RESUME at 1.
    step(
      PartitionSignal("p2", -10L, error = false, seq = 6L),
      PartitionSignal("p2", 11L, error = false, seq = 5L))
    assert(got().filter(_._1 == "p2").toSet ==
      Set(("p2", "PAUSE", 11L), ("p2", "RESUME", 1L)))

    q.stop()
  }

  test("autoPause folds identically under batch execution (q52 gate shape)") {
    // The q52 gate runs the SAME operator through Spark's batch
    // execution of flatMapGroupsWithState (state starts empty, one
    // group invocation sees all signals). The fold must match the
    // incremental streaming result: latch with hysteresis, seq order.
    val signals = Seq(
      PartitionSignal("p0", 11L, error = false, seq = 1L),
      PartitionSignal("p0", -5L, error = false, seq = 2L),
      PartitionSignal("p0", -5L, error = false, seq = 3L),
      PartitionSignal("p0", 4L, error = false, seq = 4L), // neutral: 5 ∈ (2,10]
      PartitionSignal("p1", 1L, error = true, seq = 1L),
      // out-of-seq arrival must still fold in seq order
      PartitionSignal("p2", -10L, error = false, seq = 6L),
      PartitionSignal("p2", 11L, error = false, seq = 5L)).toDS()
    val out = FlowControl.autoPause(signals, maxInFlight = 10L, minInFlight = 2L)
      .collect().map(d => (d.partition, d.action, d.inFlight)).toSet
    assert(out == Set(
      ("p0", "PAUSE", 11L), ("p0", "RESUME", 1L),
      ("p1", "PAUSE", 1L),
      ("p2", "PAUSE", 11L), ("p2", "RESUME", 1L)))
  }

  test("auto-pause decisions drive manager admission end to end (A4 loop)") {
    import org.apache.spark.sql.SaveMode
    val pm = new PipelineManager(spark,
      Files.createTempDirectory("graft-fc-pm-").toString)
    val srcDir = Files.createTempDirectory("graft-fc-src-").toString
    Seq((1L, "p0"), (2L, "p1")).toDF("k", "part")
      .write.mode(SaveMode.Append).parquet(srcDir)
    val spec = pm.create(graft.model.PipelineSpec("fcpm", "parquet", "parquet", srcDir))

    // control loop says: p1 overflowed → PAUSE; records hold back
    pm.applyFlowDecisions("fcpm", "part",
      Seq(PauseDecision("p1", "PAUSE", 11L)), identity)
    pm.queryOf("fcpm").foreach(_.awaitTermination())
    assert(pm.paused("fcpm") == Set("p1"))
    assert(spark.read.parquet(spec.destinationConnection)
      .select("k").as[Long].collect().toSet == Set(1L))

    // later decisions win per partition: PAUSE then RESUME → resume,
    // held records replay
    pm.applyFlowDecisions("fcpm", "part",
      Seq(PauseDecision("p1", "PAUSE", 11L), PauseDecision("p1", "RESUME", 1L)),
      identity)
    pm.queryOf("fcpm").foreach(_.awaitTermination())
    assert(pm.paused("fcpm").isEmpty)
    assert(spark.read.parquet(spec.destinationConnection)
      .select("k").as[Long].collect().toSet == Set(1L, 2L))
    pm.delete("fcpm")
    pm.close()
  }

  test("a mixed pause+resume decision batch costs exactly one restart") {
    import org.apache.spark.sql.SaveMode
    val pm = new PipelineManager(spark,
      Files.createTempDirectory("graft-fc-one-").toString)
    val srcDir = Files.createTempDirectory("graft-fc-one-src-").toString
    Seq((1L, "p0"), (2L, "p1"), (3L, "p2")).toDF("k", "part")
      .write.mode(SaveMode.Append).parquet(srcDir)
    val spec = pm.create(graft.model.PipelineSpec("fc1", "parquet", "parquet", srcDir))

    pm.applyFlowDecisions("fc1", "part",
      Seq(PauseDecision("p0", "PAUSE", 11L)), identity)
    pm.queryOf("fc1").foreach(_.awaitTermination())
    assert(pm.paused("fc1") == Set("p0"))

    // Count query (re)starts for this pipeline while the mixed batch
    // applies: pause(p1) + resume(p0) must fold into ONE stop/start —
    // under partition flapping two restarts double the checkpoint
    // replay churn for no behavioral difference.
    val starts = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
      import org.apache.spark.sql.streaming.StreamingQueryListener._
      override def onQueryStarted(e: QueryStartedEvent): Unit =
        if (e.name == "fc1") starts.incrementAndGet()
      override def onQueryProgress(e: QueryProgressEvent): Unit = ()
      override def onQueryTerminated(e: QueryTerminatedEvent): Unit = ()
    }
    spark.streams.addListener(listener)
    try {
      pm.applyFlowDecisions("fc1", "part",
        Seq(PauseDecision("p1", "PAUSE", 12L), PauseDecision("p0", "RESUME", 1L)),
        identity)
      pm.queryOf("fc1").foreach(_.awaitTermination())
      // listener events are async — wait for the start event to land
      val deadline = System.currentTimeMillis() + 10000
      while (starts.get() < 1 && System.currentTimeMillis() < deadline)
        Thread.sleep(50)
      assert(starts.get() == 1,
        s"mixed batch must restart exactly once, saw ${starts.get()}")
    } finally { spark.streams.removeListener(listener); pm.close() }

    // and the admission state reflects the whole batch: p1 paused going
    // forward, p0's held-back record replayed (k=2 was delivered in the
    // first run, before p1 was paused)
    assert(pm.paused("fc1") == Set("p1"))
    assert(spark.read.parquet(spec.destinationConnection)
      .select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))
    pm.delete("fc1")
  }
}
