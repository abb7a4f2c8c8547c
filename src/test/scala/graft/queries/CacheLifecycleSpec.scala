package graft.queries

import graft.{SparkEntry, SparkTestBase}

/**
 * Scope contract of the materialize-once caches: a corpus's artifacts
 * (signature parquet spill, band-index parquet dir, cached codebook
 * blocks) exist while its gates run and are ALL gone after
 * [[DataOpsQueries.release]] — the lifecycle a long-lived multi-corpus
 * deployment needs, and the one round 7 proved matters (five frames
 * persisted with no owner starved the rest of the suite).
 */
class CacheLifecycleSpec extends SparkTestBase {

  private def scratch(prefix: String, d: String): java.io.File = {
    val base = new java.io.File(d).getName.replaceAll("[^A-Za-z0-9._-]", "_")
    new java.io.File(System.getProperty("java.io.tmpdir"),
      s"${prefix}_${base}_${Integer.toHexString(d.hashCode)}_" +
        ProcessHandle.current().pid)
  }

  test("release() deletes the spill dirs and drops the codebook blocks") {
    val d = sf("0.001")
    DataOpsQueries.release(d) // start from a clean slate
    val before = spark.sparkContext.getPersistentRDDs.keySet

    // d19 builds the signature spill AND the band index; e13 builds
    // (and materializes) the persisted codebook.
    assert(SparkEntry.queries("d19_index_dedup")(spark, d).count() > 0)
    assert(SparkEntry.queries("e13_ivf_kmeans")(spark, d).count() > 0)

    val sigDir = scratch("graft_sigs", d)
    val idxDir = scratch("graft_band_index", d)
    assert(sigDir.isDirectory, s"signature spill missing at $sigDir")
    assert(new java.io.File(sigDir, "bands").isDirectory &&
      new java.io.File(sigDir, "shingles").isDirectory,
      "spill must hold the per-frame parquet dirs")
    assert(idxDir.isDirectory, s"band index missing at $idxDir")
    val added = spark.sparkContext.getPersistentRDDs.keySet -- before
    assert(added.nonEmpty, "the codebook must hold cached blocks pre-release")

    DataOpsQueries.release(d)

    assert(!sigDir.exists, "release must delete the signature spill dir")
    assert(!idxDir.exists, "release must delete the band-index dir")
    val remaining = spark.sparkContext.getPersistentRDDs.keySet
    assert((remaining & added).isEmpty,
      "release must unpersist every block the corpus's caches added")

    // And the next consumer simply rebuilds: the cache is scoped, not
    // one-shot.
    assert(SparkEntry.queries("d03_lsh_candidates")(spark, d).count() > 0)
    assert(scratch("graft_sigs", d).isDirectory, "rebuild after release")
    DataOpsQueries.release(d)
  }
}
