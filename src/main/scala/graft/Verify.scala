package graft
import org.apache.spark.sql.SparkSession
import java.nio.file.{Files, Paths}
/** Driver-run correctness dump: each SparkEntry.queries result → parquet,
  * plus oracle_sql.json, for the driver's DuckDB compare. */
object Verify {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outDir) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      // Same scan-split sizing as Engine.session (byte-small row-heavy
      // harness files; 128 MB default = single-task map stages).
      .config("spark.sql.files.maxPartitionBytes",
        sys.env.getOrElse("SPARK_GRAFT_MAX_PARTITION_BYTES", "16m"))
      // Same long-lived-driver status-store bounds as Engine.session: a
      // 63-query dump at a big scale factor otherwise retains every
      // execution's plan graph for the whole run.
      .config("spark.ui.retainedJobs", "100")
      .config("spark.ui.retainedStages", "200")
      .config("spark.ui.retainedTasks", "10000")
      .config("spark.sql.ui.retainedExecutions", "10")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    // Subset knob for big-SF spot checks, mirroring Bench's: the driver
    // contract (no env set) still dumps every query.
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    // The LSH bucket guard diverges from plain-join semantics the moment it
    // activates (star-collapse / sub-split / drop). Oracle SQL computes the
    // plain join, so a query whose guard metrics are nonzero must FAIL the
    // gate loudly instead of letting DuckDB compare diverged semantics
    // (VERDICT r6 #4). Observed-metric delivery is async — drain the
    // listener bus synchronously and diff against the names already seen
    // before each query.
    val mc = new graft.run.MetricsCollector(spark)
    // caller drains the listener bus (synchronous, exact) before calling
    def guardViolations(before: Set[String]): Seq[String] = {
      mc.snapshot.toSeq
        .filter { case (name, _) => name.startsWith("lsh_bucket_guard_") && !before(name) }
        .flatMap { case (name, fields) =>
          fields.collect {
            case (f, v: Long) if v != 0L => s"$name.$f=$v"
            case (f, v: Double) if v != 0.0 => s"$name.$f=$v"
          }
        }
    }
    SparkEntry.queries.filter { case (n, _) => only.forall(_(n)) }.foreach { case (name, fn) =>
      // drain BEFORE capturing the seen-set (ADVICE r11): when the previous
      // query threw, its post-write drain never ran, and its late-delivered
      // guard metrics would otherwise land after this capture and be
      // misattributed to this query
      org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext)
      val seen = mc.snapshot.keySet
      try {
        fn(spark, sfDir).coalesce(1).write.mode("overwrite")
          .parquet(s"$outDir/$name")
        // Only oracle-compared queries can "diverge from the oracle" —
        // rows-only queries (no oracleSql entry, e.g. q61's xxhash64
        // pipeline) keep their output: guard activation is their designed
        // bounded-work behavior, not a gate violation.
        // Synchronous listener-bus drain (ADVICE r10): metric attribution
        // is exact — no fixed 200 ms sleep per query, no late-delivered
        // metric from the PREVIOUS query leaking into this query's
        // seen-set diff. A backlogged bus (10 s deadline) degrades to the
        // old eventually-consistent read with a warning.
        if (!org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext))
          System.err.println(s"[verify] $name warning: listener bus did not " +
            "drain in 10 s — guard-metric attribution may lag one query")
        // Containment's candidate-budget guard is SQL-mirrored (the oracle
        // computes the same posting cap), so activation never diverges from
        // the oracle — report it, don't withhold (VERDICT r9 #2: "drop
        // metric visible in Verify's guard report").
        val info = mc.snapshot.toSeq
          .filter { case (n2, _) => n2.startsWith("containment_guard_") && !seen(n2) }
          .flatMap { case (n2, fields) =>
            fields.collect { case (f, v: Long) if f == "dropped_postings" && v != 0L =>
              s"$n2.$f=$v" }
          }
        if (info.nonEmpty)
          System.err.println(s"[verify] $name note: containment candidate-budget " +
            s"guard active (${info.mkString(", ")}) — oracle mirrors the cap; " +
            "curate-first (q69 order) avoids the recall loss")
        // Guard-MIRRORED oracles (q87): the oracle SQL computes the same
        // star-collapse, so activation never diverges — report as a note,
        // don't withhold (the containment-guard precedent above).
        val mirrored =
          if (SparkEntry.guardMirroredOracles(name)) guardViolations(seen)
          else Seq.empty
        if (mirrored.nonEmpty)
          System.err.println(s"[verify] $name note: LSH bucket guard active " +
            s"(${mirrored.mkString(", ")}) — oracle mirrors the star-collapse")
        val bad =
          if (SparkEntry.oracleSql.contains(name) &&
            !SparkEntry.guardMirroredOracles(name)) guardViolations(seen)
          else Seq.empty
        if (bad.nonEmpty) {
          System.err.println(
            s"[verify] $name failed: LSH bucket guard active (${bad.mkString(", ")}) — " +
              "pair semantics diverge from the plain-join oracle; output withheld")
          deleteRecursively(new java.io.File(s"$outDir/$name"))
        }
      } catch { case e: Throwable =>
        System.err.println(s"[verify] $name failed: ${e.getMessage}")
      }
    }
    mc.close()
    // JSON string escape: backslash, quote, and ALL control chars (<0x20)
    // — a tab or CR in builder-authored SQL would otherwise make the
    // driver's json.load fail and silently zero the round's correctness.
    def q(s: String): String = "\"" + s.flatMap {
      case '"'  => "\\\""
      case '\\' => "\\\\"
      case '\n' => "\\n"
      case '\r' => "\\r"
      case '\t' => "\\t"
      case c if c < ' ' => f"\\u${c.toInt}%04x"
      case c => c.toString
    } + "\""
    val json = SparkEntry.oracleSql
      .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
    Files.writeString(Paths.get(s"$outDir/oracle_sql.json"), json)
    spark.stop()
  }

  private def deleteRecursively(f: java.io.File): Unit = {
    if (f.isDirectory) f.listFiles().foreach(deleteRecursively)
    f.delete()
  }
}
