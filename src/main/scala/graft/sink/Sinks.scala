package graft.sink

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Relational

/** Sink abstraction (SURVEY.md §2.1 S6–S12). The hermetic build writes
  * parquet laid out like the target tables (partition key ≙ CQL partition
  * key, sortWithinPartitions ≙ clustering order); JDBC / Cassandra-connector
  * implementations plug in behind the same trait — batching, retry, and
  * concurrency are connector config there, not engine code (the reference's
  * adaptive CQL batching, `etl/loaders/cassandra_loader.py:81-268`, is
  * Spark-side `spark.cassandra.output.*` settings).
  */
trait TableSink {
  def overwrite(table: String, df: DataFrame): Unit
  def append(table: String, df: DataFrame): Unit

  /** S8 — upsert (`postgres_loader.py:29-65` `ON CONFLICT DO UPDATE`): for
    * file sinks, read-merge-rewrite keyed on `keys`; a JDBC sink would issue
    * MERGE per partition instead.
    */
  def upsert(table: String, df: DataFrame, keys: Seq[String]): Unit
}

final class ParquetSink(baseDir: String) extends TableSink {
  private def path(table: String) = s"$baseDir/$table"

  def overwrite(table: String, df: DataFrame): Unit =
    df.write.mode("overwrite").parquet(path(table))

  def append(table: String, df: DataFrame): Unit =
    df.write.mode("append").parquet(path(table))

  def upsert(table: String, df: DataFrame, keys: Seq[String]): Unit = {
    val spark = df.sparkSession
    val existing =
      try Some(spark.read.parquet(path(table)))
      catch { case _: Exception => None }
    val merged = existing match {
      case None => df
      case Some(old) =>
        // new rows win: overwrite matched keys' columns, keep unmatched rows
        val updated = Relational.overwriteByJoin(old, df, keys)
        val newRows = df.join(old.select(keys.map(col): _*).distinct(), keys, "left_anti")
        updated.unionByName(newRows, allowMissingColumns = true)
    }
    // write through a temp dir: the source parquet is an input of the plan
    val tmp = path(table) + "__tmp"
    merged.write.mode("overwrite").parquet(tmp)
    val fs = org.apache.hadoop.fs.FileSystem.get(
      spark.sparkContext.hadoopConfiguration)
    val dst = new org.apache.hadoop.fs.Path(path(table))
    fs.delete(dst, true)
    fs.rename(new org.apache.hadoop.fs.Path(tmp), dst)
  }
}
