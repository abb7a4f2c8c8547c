package graft.tools

import org.apache.spark.sql.SparkSession

/**
 * Cross-JVM snapshot reader — the child half of StoreFuzzSpec's
 * forked-reader test: a SECOND JVM (own SparkSession) polling
 * [[graft.streaming.EpochPartitionedStore.readSnapshot]] against a
 * store whose OWNER, in another JVM, is concurrently ingesting and
 * tier-compacting. This is the deployment shape the snapshot protocol
 * exists for (a serving/diag JVM beside the ingest driver), and the
 * one a same-JVM fuzz thread cannot prove: no shared caches, no
 * shared view state, only the filesystem protocol.
 *
 * Contract checked per read, against args `dir partCol name perEpoch
 * reads`:
 *  - committed-prefix-exact: every epoch writes exactly `perEpoch`
 *    rows, so any snapshot's count must be a multiple of it — a
 *    torn read (half an epoch, a swept-but-still-listed file, a
 *    double-counted run) breaks the multiple;
 *  - monotonic: the committed prefix only grows, so counts never
 *    shrink across reads.
 *
 * Prints `SNAPOK <last>` and exits 0 on success; `SNAPFAIL <why>`
 * with a nonzero exit otherwise. STRICTLY READ-ONLY: readSnapshot
 * never runs owner recovery, so this process cannot perturb the
 * owner's in-flight compaction.
 */
object SnapshotReaderProcess {
  def main(args: Array[String]): Unit = {
    val Array(dir, partCol, name, perEpochS, readsS) = args
    val perEpoch = perEpochS.toLong
    val reads = readsS.toInt
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-snapshot-reader")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    var code = 0
    try {
      // The snapshot grace window is ONE compaction cadence: a reader
      // whose read outlasts it (here the owner ticks every epoch,
      // far faster than any deployment) loses files to the deferred
      // sweep mid-job and must re-list — that is the documented
      // retry contract, distinct from a torn result (which is a
      // protocol bug and fails the run). Only FileNotFound shapes
      // retry; anything else is a real failure.
      def isSweepRace(t: Throwable): Boolean =
        Iterator.iterate(t)(_.getCause).takeWhile(_ != null).take(10)
          .exists { c =>
            val msg = Option(c.getMessage).getOrElse("")
            c.isInstanceOf[java.io.FileNotFoundException] ||
              msg.contains("FileNotFoundException") ||
              // the analysis-time shape of the same race: the schema
              // probe's path was swept between listing and resolution
              msg.contains("PATH_NOT_FOUND") ||
              msg.contains("does not exist")
          }
      def readOnce(attempt: Int): Long =
        try graft.streaming.EpochPartitionedStore
          .readSnapshot(spark, dir, partCol, name)
          .map(_.count()).getOrElse(0L)
        catch {
          case t: Throwable if isSweepRace(t) && attempt < 5 =>
            readOnce(attempt + 1)
        }
      var last = 0L
      var i = 0
      while (i < reads && code == 0) {
        val n = readOnce(0)
        if (n % perEpoch != 0L) {
          println(s"SNAPFAIL not-a-committed-prefix count=$n per=$perEpoch")
          code = 2
        } else if (n < last) {
          println(s"SNAPFAIL shrank $last -> $n")
          code = 3
        } else last = n
        i += 1
        Thread.sleep(100L)
      }
      if (code == 0) println(s"SNAPOK $last")
    } catch {
      case t: Throwable =>
        println(s"SNAPFAIL ${t.getClass.getName}: ${t.getMessage}")
        code = 4
    } finally spark.stop()
    sys.exit(code)
  }
}
