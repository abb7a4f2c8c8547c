package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}

/**
 * Bucketed-table helpers: pre-shuffle once at write time so every
 * later join/aggregation on the bucket key is co-located (zero
 * exchange at read time).
 *
 * This is the Spark analog of the reference's "destination reuse" idea
 * applied to storage: the reference co-locates work by assigning the
 * same source partitions to the same tasks
 * (StickyPartitionAssignmentStrategy.java:53-70); a bucketed table
 * makes that assignment durable in the file layout. At 100 TB, a fact
 * table bucketed on its join key turns every fact⋈dim-bucket join from
 * a full shuffle into a per-bucket local merge.
 */
object Bucketing {

  /** Write `df` as a bucketed, sorted table registered as `name`. */
  def writeBucketed(df: DataFrame, name: String, key: String,
      numBuckets: Int): Unit =
    df.write
      .mode(SaveMode.Overwrite)
      .bucketBy(numBuckets, key)
      .sortBy(key)
      .saveAsTable(name)

  /**
   * Write `df` hive-partitioned by `key` — the directory-pruning
   * counterpart of [[writeBucketed]]: bucketing co-locates JOINS,
   * partitioning prunes SCANS. A filter on the partition column is
   * resolved against the directory listing at planning time, so a
   * one-day query over a years-long 100 TB corpus opens one day's
   * files (the `PartitionFilters` line in the scan, vs `PushedFilters`
   * which still opens every file and skips row groups).
   */
  def writePartitioned(df: DataFrame, path: String, key: String): Unit =
    df.write.mode(SaveMode.Overwrite).partitionBy(key).parquet(path)
}
