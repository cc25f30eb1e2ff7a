package graft.run

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** Observation-based per-stage metrics (SURVEY.md §2.1 S13 / §2.6 A8,
  * `etl/utils/metrics.py`): `df.observe` attaches named aggregates that are
  * computed DURING whatever action materializes the frame — no extra count
  * job per entity, which matters when the frame is 100 TB. Results arrive
  * through a [[QueryExecutionListener]] (delivered asynchronously after the
  * action; [[snapshot]] is eventually consistent, [[await]] polls).
  */
final class MetricsCollector(spark: SparkSession) extends AutoCloseable {

  private val seen = TrieMap.empty[String, Map[String, Any]]

  private val listener = new QueryExecutionListener {
    override def onSuccess(funcName: String, qe: QueryExecution, durationNs: Long): Unit =
      qe.observedMetrics.foreach { case (name, row) =>
        seen.put(name, row.schema.fieldNames.zip(row.toSeq).toMap)
      }
    override def onFailure(funcName: String, qe: QueryExecution, ex: Exception): Unit = ()
  }
  spark.listenerManager.register(listener)

  /** Attach row/error-style counters to a frame; they materialize with the
    * frame's next action.
    */
  def observeRows(df: DataFrame, name: String): DataFrame =
    df.observe(name, count(lit(1)).as("rows"))

  def snapshot: Map[String, Map[String, Any]] = seen.toMap

  /** Nonzero numeric fields of observations whose name starts with `prefix`
    * and was NOT in `before` — the snapshot-diff attribution idiom shared
    * by the guard-disclosure call sites (Verify / RunTrainPrep /
    * RunMediaAudit grew three hand-rolled copies of it; keep the
    * semantics in one place). Doubles round to Long (the guard's
    * fractional counter, dropped_sub_buckets, is integral by
    * construction — Σ 1/s over s rows each).
    */
  def newNonZeroByPrefix(
      prefix: String, before: Set[String]): Map[String, Map[String, Long]] =
    snapshot.toSeq
      .filter { case (name, _) => name.startsWith(prefix) && !before(name) }
      .map { case (name, fields) =>
        name -> fields.collect {
          case (f, v: Long) if v != 0L => f -> v
          case (f, v: Double) if v != 0.0 => f -> math.round(v)
        }
      }
      .filter(_._2.nonEmpty)
      .toMap

  /** Poll until the named observation has been delivered (listener delivery
    * is async relative to the action).
    */
  def await(name: String, timeoutMs: Long = 10000): Option[Map[String, Any]] = {
    val deadline = System.currentTimeMillis() + timeoutMs
    while (!seen.contains(name) && System.currentTimeMillis() < deadline) Thread.sleep(20)
    seen.get(name)
  }

  override def close(): Unit = spark.listenerManager.unregister(listener)
}
