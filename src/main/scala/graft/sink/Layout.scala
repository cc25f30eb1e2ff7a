package graft.sink

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Physical-layout tools for repeated access patterns (SURVEY.md §4
  * "partition layout"; the 100 TB design levers the cluster relies on):
  *
  *   - **bucketing**: tables joined repeatedly on the same key are written
  *     pre-hashed into the same bucket count, so the join needs NO shuffle —
  *     the shuffle is paid once at write time instead of per query;
  *   - **partitioning**: predicate columns become directory partitions, so
  *     scans touch only matching directories (PartitionFilters, not data
  *     filters).
  */
object Layout {

  /** Write `df` as a bucketed (and optionally sort-ordered) managed table.
    * Joining two tables bucketed on the same key with the same count is
    * shuffle-free; sorting within buckets additionally removes the
    * sort-merge-join's sort.
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketKey: String,
      numBuckets: Int,
      sortCols: Seq[String] = Nil): Unit = {
    val writer = df.write.mode("overwrite").bucketBy(numBuckets, bucketKey)
    (if (sortCols.nonEmpty) writer.sortBy(sortCols.head, sortCols.tail: _*) else writer)
      .format("parquet")
      .saveAsTable(table)
  }

  /** Write `df` directory-partitioned on `partitionCol` — equality/IN
    * predicates on it prune at the file listing, before any IO.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)
}
