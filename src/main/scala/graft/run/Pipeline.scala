package graft.run

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.model.{Destination, Entities, EntityConfig}

/** Host-level orchestration parity (SURVEY.md §3.1): entity jobs run in the
  * topological order of COLLECTION_MAPPINGS (`settings.py:136-137`,
  * `orchestrator.py:181-188` forces sequential mode for FK integrity); each
  * job's *internal* plan is a Spark DAG. Dimension results are registered so
  * later jobs resolve FKs against them (the reference's warm-cache phase,
  * `orchestrator.py:86-102`). `dryRun` mirrors extract+transform-without-
  * load (`run_etl.py:67-71`).
  */
final class Pipeline(
    spark: SparkSession,
    source: String => DataFrame,
    sink: (String, Destination, DataFrame) => Unit,
    dryRun: Boolean = false,
    collector: Option[MetricsCollector] = None) {

  /** One per-entity stage: given (sourceDF, dims-so-far) produce the final
    * frame per destination.
    */
  type Stage = (DataFrame, Map[String, DataFrame]) => Map[Destination, DataFrame]

  private val results = mutable.LinkedHashMap[(String, Destination), DataFrame]()
  private val metrics = mutable.LinkedHashMap[String, Long]()

  def dim(name: String, destination: Destination = Destination.Postgres): Option[DataFrame] =
    results.get((name, destination))

  /** Run entities in topo order with the provided stage implementations.
    * Entities without a stage are skipped (partial runs, like the
    * reference's `--entities` flag).
    */
  def run(stages: Map[String, Stage]): Map[(String, Destination), DataFrame] = {
    // S13: per-entity row counts ride the sink action itself as observed
    // metrics — a separate count() per entity would be a second full pass
    // over every frame (×15 entities; prohibitive when a frame is 100 TB).
    val mc = collector.getOrElse(new MetricsCollector(spark))
    try {
      for (cfg <- Entities.ordered; stage <- stages.get(cfg.name)) {
        val src = source(cfg.mongo)
        // dims exposed as "name" (Postgres result preferred — FK resolution
        // targets the relational ids, like the reference's pg_id_mapper) and
        // as "name:postgres"/"name:cassandra" for explicit dialect picks
        val qualified = results.map { case ((n, dest), df) =>
          s"$n:${dest.toString.toLowerCase}" -> df
        }
        val bare = results.groupBy(_._1._1).map { case (n, m) =>
          n -> m.getOrElse((n, Destination.Postgres), m.head._2)
        }
        val out = stage(src, (bare ++ qualified).toMap)
        for ((dest, df) <- out) {
          val name = s"${cfg.name}/${dest.toString.toLowerCase}"
          // cache: later entities broadcast-join against this result, and the
          // sink re-reads it — one computation, many consumers (K3 contract:
          // ids are computed once, never re-derived with drifting state)
          val cached = mc.observeRows(df, name).cache()
          results((cfg.name, dest)) = cached
          // the sink write doubles as the materializing action; dry runs
          // (extract+transform only, `run_etl.py:67-71`) still materialize so
          // dims are warm and the observation fires
          if (!dryRun) sink(cfg.name, dest, cached) else cached.count()
          for (m <- mc.await(name))
            metrics(name) = m("rows").asInstanceOf[Long]
        }
      }
      results.toMap
    } finally if (collector.isEmpty) mc.close()
  }

  /** Per-entity row counts (`etl/utils/metrics.py` parity). */
  def report: Map[String, Long] = metrics.toMap
}

object Pipeline {
  /** Parquet-backed sink for the hermetic build (S6/S9 stand-in). */
  def parquetSink(baseDir: String): (String, Destination, DataFrame) => Unit =
    (entity, dest, df) =>
      df.write.mode("overwrite").parquet(s"$baseDir/${dest.toString.toLowerCase}/$entity")
}
