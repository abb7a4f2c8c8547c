package graft.streaming

import java.nio.file.Files
import java.util.concurrent.ConcurrentLinkedQueue
import java.util.concurrent.atomic.AtomicInteger

import scala.jdk.CollectionConverters._
import scala.util.Random

import org.apache.hadoop.fs.Path

import graft.SparkTestBase

/**
 * Property-style race fuzzer for the pipeline execution-lock layer —
 * the class of bug ordinary example tests kept missing (round 13's
 * second review pass found four real lease-mode races the first pass
 * had not seen). N worker threads across several live
 * [[PipelineManager]]s on ONE durable root hammer
 * acquire/release/abandon while injected chaos ages registrations
 * (hard crashes), plants empty lock files young and old (the
 * create-to-write window and the crashed-mid-create orphan), and runs
 * a maintenance sweeper that removes stale empties through the same
 * rename-verify protocol the managers use.
 *
 * Invariants checked:
 *  1. never two simultaneous owners of one pipeline: a per-pipeline
 *     holder counter incremented only between a NEWLY-successful
 *     acquire and its release must never exceed 1 — any overlap of
 *     two managers' hold windows is a violation regardless of thread
 *     interleaving;
 *  2. no lock is leaked: after every manager is closed or crashed, a
 *     fresh manager must be able to acquire EVERY pipeline (abandoned
 *     and reclaimed ones included);
 *  3. every `_reclaim-*` tombstone is accounted: the protocol deletes
 *     them on success and restores-or-keeps only on verified
 *     interference, so none may remain at quiescence.
 *
 * Fixed seeds, bounded rounds — deterministic op streams (the OS
 * schedules the interleaving; the invariants hold for all of them).
 */
class LockFuzzSpec extends SparkTestBase {

  private val Lease = 600000L // expiry is SIMULATED by aging, never slept for
  private val Pipelines = Vector("fz0", "fz1", "fz2", "fz3")
  private val ThreadsPerPhase = 6
  private val OpsPerThread = 60
  private val Phases = 5

  test("lock layer survives concurrent acquire/release/reclaim with injected crashes") {
    for (seed <- Seq(1014L, 2026L)) runFuzz(seed)
  }

  private def runFuzz(seed: Long): Unit = {
    val root = Files.createTempDirectory(s"graft-lockfuzz-$seed-").toString
    val fs = new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)
    val violations = new ConcurrentLinkedQueue[String]()
    val holders = Pipelines.map(_ => new AtomicInteger(0))
    // (pipeline index, manager id) locks acquired and deliberately
    // never released — the crashed-while-holding inventory
    val abandoned = new ConcurrentLinkedQueue[(Int, String)]()

    var generation = 0
    def newManager(): PipelineManager = {
      generation += 1
      new PipelineManager(spark, root, instance = s"M$generation-g$seed",
        livenessLeaseMs = Lease)
    }
    var live = Vector.fill(3)(newManager())
    val crashed = scala.collection.mutable.Buffer.empty[PipelineManager]

    def worker(mgr: PipelineManager, rnd: Random): Runnable = () => {
      var ops = 0
      while (ops < OpsPerThread) {
        ops += 1
        val pi = rnd.nextInt(Pipelines.size)
        val p = Pipelines(pi)
        rnd.nextInt(10) match {
          case n if n < 6 =>
            // acquire → hold → release. The counter brackets exactly
            // the window in which this MANAGER newly owns the lock.
            val newly =
              try mgr.acquireLock(p)
              catch { case _: PipelineLockedException => false }
            if (newly) {
              val c = holders(pi).incrementAndGet()
              if (c > 1)
                violations.add(s"seed=$seed: $c simultaneous owners of $p " +
                  s"(second: ${mgr.instanceId})"): Unit
              if (rnd.nextInt(4) == 0) Thread.sleep(1L)
              holders(pi).decrementAndGet()
              mgr.releaseLock(p)
            }
          case 6 =>
            // acquire and ABANDON (simulated crash-while-holding: the
            // lock stays until this manager is aged out and reclaimed)
            val newly =
              try mgr.acquireLock(p)
              catch { case _: PipelineLockedException => false }
            if (newly) {
              val c = holders(pi).incrementAndGet()
              if (c > 1)
                violations.add(s"seed=$seed: $c simultaneous owners of $p " +
                  s"(abandoning: ${mgr.instanceId})"): Unit
              abandoned.add((pi, mgr.instanceId)): Unit
            }
          case 7 =>
            // plant an empty lock file (a rival's create-to-write
            // window); sometimes age it into a crashed-mid-create
            // orphan that the next acquirer may legitimately reclaim
            // in-JVM participants serialize on the stripe monitor (the
            // local FS create(overwrite=false) is check-then-create;
            // the managers rely on the same monitor)
            val lp = new Path(s"$root/locks/${Pipelines(rnd.nextInt(Pipelines.size))}.lock")
            PipelineManager.lockStripe(lp.toString).synchronized {
              try {
                fs.mkdirs(lp.getParent)
                fs.create(lp, false).close()
                if (rnd.nextBoolean())
                  fs.setTimes(lp, System.currentTimeMillis() -
                    PipelineManager.AcquireGraceMs - 1000L, -1)
              } catch { case _: java.io.IOException => () } // held: planted nothing
            }
          case _ =>
            // maintenance sweeper: remove a stale EMPTY lock file via
            // the same rename-verify protocol the managers use — a
            // blind delete could erase a rival's freshly-written lock
            val lp = new Path(s"$root/locks/${Pipelines(rnd.nextInt(Pipelines.size))}.lock")
            val tomb = new Path(lp.getParent,
              s"_reclaim-${lp.getName}-sweep${rnd.nextInt(1000000)}")
            PipelineManager.lockStripe(lp.toString).synchronized {
              try if (fs.rename(lp, tomb)) {
                val in = fs.open(tomb)
                val bytes = try in.readAllBytes() finally in.close()
                val age = System.currentTimeMillis() -
                  fs.getFileStatus(tomb).getModificationTime
                // only an EMPTY file past the grace window is sweepable
                // — a young empty is a rival's create-to-write window
                // and a written one is (or was) a real lock: restore
                if (bytes.isEmpty && age >= PipelineManager.AcquireGraceMs)
                  fs.delete(tomb, false): Unit
                else if (!fs.rename(tomb, lp)) () // keep tombstone as audit
                else ()
              } catch { case _: java.io.IOException => () }
            }
        }
      }
    }

    val rnd = new Random(seed)
    for (phase <- 1 to Phases) {
      val threads = (0 until ThreadsPerPhase).map { i =>
        val t = new Thread(worker(live(i % live.size), new Random(seed * 1000 + phase * 100 + i)),
          s"fuzz-$seed-$phase-$i")
        t.start(); t
      }
      threads.foreach(_.join())
      // between phases: hard-crash one manager (age its registration
      // past the lease — no close()), release its abandoned holds from
      // the bookkeeping (its locks are now reclaimable orphans), and
      // bring up a replacement under a fresh id
      if (phase < Phases && rnd.nextInt(3) != 0) {
        val victimIdx = rnd.nextInt(live.size)
        val victim = live(victimIdx)
        fs.setTimes(new Path(s"$root/instances/${victim.instanceId}"),
          System.currentTimeMillis() - Lease - 60000L, -1)
        abandoned.asScala.toList.foreach { case (pi, owner) =>
          if (owner == victim.instanceId) {
            holders(pi).decrementAndGet()
            abandoned.remove((pi, owner)): Unit
          }
        }
        crashed += victim
        live = live.updated(victimIdx, newManager())
      }
    }

    assert(violations.isEmpty, s"ownership violations: ${violations.asScala.toList}")

    // quiescence: close every live manager (crashed ones never close —
    // their registrations are already aged); a fresh manager must then
    // acquire EVERY pipeline: nothing is leaked in a state no live
    // instance can take over
    live.foreach(_.close())
    // chaos-planted empty files may still be inside the acquire grace
    // window; age them past it (the wall-clock equivalent of letting
    // quiescence last AcquireGraceMs) so the leak check below sees
    // their true, judgeable state
    Option(fs.globStatus(new Path(s"$root/locks/*.lock"))).toSeq.flatten
      .filter(_.getLen == 0)
      .foreach(st => fs.setTimes(st.getPath, System.currentTimeMillis() -
        PipelineManager.AcquireGraceMs - 1000L, -1))
    val fresh = newManager()
    Pipelines.foreach { p =>
      val got =
        try fresh.acquireLock(p)
        catch { case e: PipelineLockedException =>
          fail(s"seed=$seed: pipeline $p leaked — still locked by ${e.lockedBy}")
        }
      assert(got, s"seed=$seed: fresh manager re-entered $p it never took")
      fresh.releaseLock(p)
    }
    fresh.close()

    // every tombstone accounted: none remain at quiescence
    val tombs = Option(fs.globStatus(new Path(s"$root/locks/_reclaim-*")))
      .toSeq.flatten.map(_.getPath.getName)
    assert(tombs.isEmpty, s"seed=$seed: stranded tombstones $tombs")

    // cleanup: listener hygiene for the crashed managers (invariants
    // are already checked; this close only detaches them from the
    // shared session)
    crashed.foreach(m => try m.close() catch { case _: Throwable => () })
    fs.delete(new Path(root), true)
  }
}
