package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for large⨝large equi-joins (SURVEY.md §7.4 risk 7: chat
  * data has giant rooms). AQE's skew-join splitting is the first line of
  * defense (enabled in [[graft.Engine]]); this explicit salt is the fallback
  * when a single key exceeds what one task can hold even after AQE splits —
  * e.g. building per-room aggregates where one room has 10^9 messages.
  *
  * The salt is DETERMINISTIC (hash of a row-identity column, not `rand()`):
  * retried tasks and replayed stages must land rows in the same salted
  * partition or results diverge under failure recovery.
  */
object Skew {

  /** Equi-join `fact ⨝ dim` on `key`, spreading each fact key across
    * `saltFactor` partitions; the (small) `dim` side is replicated
    * `saltFactor`×. Semantically identical to `fact.join(dim, key)`.
    *
    * @param factRowId a fact column whose hash spreads rows (any
    *                  high-cardinality column, e.g. the fact PK)
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      factRowId: String,
      saltFactor: Int = 8,
      joinType: String = "inner"): DataFrame = {
    val salted = fact.withColumn("__salt",
      pmod(xxhash64(col(factRowId)), lit(saltFactor.toLong)).cast("int"))
    val replicated = dim.withColumn("__salt",
      explode(array((0 until saltFactor).map(lit): _*)))
    salted.join(replicated, Seq(key, "__salt"), joinType).drop("__salt")
  }

  /** Two-phase skew-tolerant aggregation: partial-aggregate on
    * (key, salt), then final-aggregate on key. For algebraic aggregates
    * Spark's map-side partial aggregation already does this; use this form
    * for the non-algebraic cases (e.g. `collect_list` buckets that would
    * blow a single reducer).
    */
  def saltedGroupAgg(
      df: DataFrame,
      key: String,
      rowId: String,
      saltFactor: Int,
      partialAggs: Seq[Column],
      finalAggs: Seq[Column]): DataFrame =
    df.withColumn("__salt", pmod(xxhash64(col(rowId)), lit(saltFactor.toLong)).cast("int"))
      .groupBy(col(key), col("__salt"))
      .agg(partialAggs.head, partialAggs.tail: _*)
      .groupBy(col(key))
      .agg(finalAggs.head, finalAggs.tail: _*)
}
