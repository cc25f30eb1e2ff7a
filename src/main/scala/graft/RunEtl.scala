package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.model.{Destination, Entities}
import graft.run.{EntityStages, Pipeline}
import graft.sources.{DocumentSource, JsonSource, ParquetSource}

/** CLI entry with the reference's flag surface (`run_etl.py:47-111`):
  *
  * {{{
  * runMain graft.RunEtl --source <dir> --out <dir>
  *   [--entities user,room,...] [--entity user]
  *   [--target postgres|cassandra|both] [--dry-run] [--truncate]
  *   [--batch-size N] [--list-entities] [--validate]
  * }}}
  *
  * `--source` reads `<collection>.jsonl` (mongo-document shape) or
  * `<collection>.parquet` per collection. `--entities` runs a partial
  * migration; FK parents are auto-included ([[EntityStages.closure]] — the
  * hermetic stand-in for the reference's warm id-mapping cache). `--target`
  * restricts which destinations are LOADED (transforms still run, so dual
  * entities keep consistent ids — the reference's dry-run-per-destination
  * behavior). `--batch-size` bounds rows per output file
  * (`spark.sql.files.maxRecordsPerFile`), the file-sink analog of the
  * reference's load batching. `--truncate` deletes the selected entities'
  * target directories first. `--validate` only checks that every selected
  * entity's source collection is readable.
  */
object RunEtl {

  final case class Config(
      sourceDir: String = "",
      outDir: String = "",
      entities: Seq[String] = Nil, // empty = all
      target: String = "both",
      dryRun: Boolean = false,
      truncate: Boolean = false,
      batchSize: Option[Int] = None,
      listEntities: Boolean = false,
      validateOnly: Boolean = false)

  def parse(args: Seq[String]): Config = {
    def loop(rest: List[String], cfg: Config): Config = rest match {
      case Nil => cfg
      case "--source" :: v :: t => loop(t, cfg.copy(sourceDir = v))
      case "--out" :: v :: t => loop(t, cfg.copy(outDir = v))
      case "--entities" :: v :: t =>
        loop(t, cfg.copy(entities = cfg.entities ++ v.split(",").map(_.trim).filter(_.nonEmpty)))
      case "--entity" :: v :: t => loop(t, cfg.copy(entities = cfg.entities :+ v))
      case "--target" :: v :: t =>
        require(Set("postgres", "cassandra", "both")(v), s"bad --target $v")
        loop(t, cfg.copy(target = v))
      case "--dry-run" :: t => loop(t, cfg.copy(dryRun = true))
      case "--truncate" :: t => loop(t, cfg.copy(truncate = true))
      case "--batch-size" :: v :: t => loop(t, cfg.copy(batchSize = Some(v.toInt)))
      case "--list-entities" :: t => loop(t, cfg.copy(listEntities = true))
      case "--validate" :: t => loop(t, cfg.copy(validateOnly = true))
      case other :: _ => throw new IllegalArgumentException(s"unknown argument: $other")
    }
    val cfg = loop(args.toList, Config())
    val unknown = cfg.entities.filterNot(Entities.byName.contains)
    require(unknown.isEmpty, s"unknown entities: ${unknown.mkString(", ")}")
    cfg
  }

  private def destMatches(target: String, dest: Destination): Boolean = target match {
    case "both" => true
    case "postgres" => dest == Destination.Postgres
    case "cassandra" => dest == Destination.Cassandra
    case _ => false
  }

  /** Runs the selected migration; returns (ok, per-entity row counts).
    * Factored out of `main` so specs can drive the CLI path on a shared
    * session.
    */
  def execute(spark: SparkSession, cfg: Config): (Boolean, Map[String, Long]) = {
    if (cfg.listEntities) {
      Entities.ordered.foreach { e =>
        println(f"${e.order}%2d ${e.name} <- ${e.mongo} " +
          s"[${e.strategy.destinations.mkString(", ")}]")
      }
      return (true, Map.empty)
    }
    require(cfg.sourceDir.nonEmpty, "--source is required")

    val listing = Option(new java.io.File(cfg.sourceDir).listFiles()).getOrElse(Array.empty)
    val src: DocumentSource =
      if (listing.exists(_.getName.endsWith(".jsonl"))) new JsonSource(spark, cfg.sourceDir)
      else new ParquetSource(spark, cfg.sourceDir)
    def collection(name: String): DataFrame =
      EntityStages.normalizeTimestamps(src.collection(name))

    val selected: Set[String] =
      if (cfg.entities.isEmpty) Entities.all.map(_.name).toSet
      else EntityStages.closure(cfg.entities)

    if (cfg.validateOnly) {
      val bad = Entities.ordered.filter(e => selected(e.name)).flatMap { e =>
        try { collection(e.mongo).schema; None }
        catch { case ex: Exception => Some(s"${e.name}: ${ex.getMessage.linesIterator.next()}") }
      }
      bad.foreach(m => System.err.println(s"[run-etl] unreadable source: $m"))
      return (bad.isEmpty, Map.empty)
    }

    require(cfg.outDir.nonEmpty || cfg.dryRun, "--out is required unless --dry-run")

    if (cfg.truncate && !cfg.dryRun) {
      for (e <- Entities.ordered if selected(e.name); d <- e.strategy.destinations
        if destMatches(cfg.target, d)) {
        val dir = java.nio.file.Paths.get(cfg.outDir, d.toString.toLowerCase, e.name)
        if (java.nio.file.Files.exists(dir)) {
          import scala.jdk.CollectionConverters._
          java.nio.file.Files.walk(dir).iterator().asScala.toSeq.reverse
            .foreach(java.nio.file.Files.delete)
        }
      }
    }

    // target filtering happens at the SINK: dual-destination transforms still
    // compute both frames so sequential ids stay consistent across partial
    // loads, but only the requested destination is written — the other gets
    // dry-run treatment (materialized for metrics + downstream dims, not
    // loaded), matching `run_etl.py`'s extract+transform-without-load split.
    // Cassandra-destination entities are laid out per their CQL table's
    // catalog entry (partition-key directories, clustering-ordered files —
    // the storage property the reference gets from Scylla); the directory
    // keeps the entity name so Validate/read-back paths are unchanged.
    // NOTE: partitionBy read-back re-infers partition-key column types from
    // directory names (see CqlLayouts.writeTo scaladoc) — fine for these
    // numeric/uuid keys and Validate's count-based checks, but a
    // schema-sensitive consumer should read with an explicit schema.
    val base = Pipeline.parquetSink(cfg.outDir)
    val sink: (String, Destination, DataFrame) => Unit =
      (entity, dest, df) =>
        if (!destMatches(cfg.target, dest)) df.count(): Unit
        else {
          val layout =
            if (dest == Destination.Cassandra)
              Entities.byName(entity).cassandraTable.flatMap(graft.sink.CqlLayouts.all.get)
            else None
          layout match {
            case Some(l) =>
              val needed = l.partitionKeys ++ l.clustering.map(_._1)
              val missing = needed.filterNot(df.columns.contains)
              if (missing.isEmpty)
                graft.sink.CqlLayouts.writeTo(
                  df, s"${cfg.outDir}/${dest.toString.toLowerCase}/$entity", l)
              else {
                // never fail the migration over a layout column drift — warn
                // loudly and keep the rows (unordered beats absent)
                System.err.println(s"[run-etl] $entity: layout columns " +
                  s"${missing.mkString(", ")} missing; writing without CQL layout")
                base(entity, dest, df)
              }
            case None => base(entity, dest, df)
          }
        }

    // --batch-size is scoped to this run: execute() may share a session with
    // its caller (specs, embedding applications), which must not inherit a
    // tiny maxRecordsPerFile on every later write
    val prevBatch = cfg.batchSize.map(_ => spark.conf.get("spark.sql.files.maxRecordsPerFile"))
    cfg.batchSize.foreach(n =>
      spark.conf.set("spark.sql.files.maxRecordsPerFile", n.toString))
    try {
      val stages = EntityStages.all.filter { case (name, _) => selected(name) }
      val pipe = new Pipeline(spark, collection, sink, dryRun = cfg.dryRun)
      pipe.run(stages)
      (true, pipe.report)
    } finally prevBatch.foreach(v =>
      spark.conf.set("spark.sql.files.maxRecordsPerFile", v))
  }

  def main(args: Array[String]): Unit = {
    val cfg = parse(args.toSeq)
    val spark = Engine.session(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")}]",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4").toInt,
      appName = "graft-etl")
    try {
      val (ok, report) = execute(spark, cfg)
      if (report.nonEmpty) println(s"[run-etl] rows: $report")
      if (!ok) sys.exit(1)
    } finally spark.stop()
  }
}
