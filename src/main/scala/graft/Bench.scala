package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    // the harness machine is 32-way; size parallelism to it unless told otherwise
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      // Same spill-aware sizing as Engine.session: shuffles START at 8x
      // cores so a 100x scale factor can't put one aggregation's whole
      // state in a single task (q45/q38 died exactly that way at /tmp/sf10
      // with a flat 32); AQE's parallelismFirst coalesces small stages
      // back to core count, so sf0.1 numbers are unaffected.
      .config(
        "spark.sql.adaptive.coalescePartitions.initialPartitionNum",
        sys.env.getOrElse("SPARK_GRAFT_INIT_PARTITIONS", (cpus.toInt * 8).toString))
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // Runs one query and returns (seconds, error). Failures are NEVER
    // silent: they go to stderr here and into the JSON's "failed" list —
    // a broken query must not read as a faster bench. clearCache between
    // queries keeps one query's cached tables from billing the next.
    // Consumption is toRdd.count(), NOT Dataset.count(): stacking a count
    // aggregate on top lets Catalyst prune every unreferenced projection
    // column and sort, so map-only queries (regex scrub, simhash, crypto,
    // windows whose value column isn't re-aggregated) would bench as bare
    // row-count scans — q20 benched 0.11 s vs 2.6 s honest, q34 0.16 vs
    // 2.4 s. toRdd executes the query's own physical plan in full.
    def run(name: String, fn: (SparkSession, String) => org.apache.spark.sql.DataFrame,
        tag: String): (Double, Option[String]) = {
      val t0 = System.nanoTime()
      val err =
        try { fn(spark, sfDir).queryExecution.toRdd.count(); None }
        catch {
          case t: Throwable =>
            System.err.println(s"[bench] $tag $name FAILED: $t")
            Some(t.toString)
        }
      val elapsed = (System.nanoTime() - t0) / 1e9
      // cache teardown happens OUTSIDE the timed window — it protects the
      // NEXT query from inherited session state, it is not this query's cost
      spark.catalog.clearCache()
      (elapsed, err)
    }

    // untimed warmup pass: absorbs one-time JVM/JIT/whole-stage-codegen
    // compilation so the timed pass reflects steady-state throughput (the
    // long-running-cluster number; first-query cost was ~5 s of Janino/JIT)
    SparkEntry.queries.foreach { case (name, fn) => run(name, fn, "warmup") }
    // two timed reps per query: "queries" (the headline) and a second warm
    // rep so ordering/session effects can't masquerade as plan regressions
    val cold = SparkEntry.queries.toSeq.map { case (name, fn) => name -> run(name, fn, "cold") }
    val warm = SparkEntry.queries.toSeq.map { case (name, fn) => name -> run(name, fn, "warm") }

    // q31/q54 memoize their footer-stats rows per (session, dir), so both
    // timed reps above measure a map hit. Clear the memo and time one more
    // run each: the honest first-computation cost of the pushdown footer
    // scan (the number to read as scan cost; the cached entries show the
    // steady-state serving cost).
    val firstComputation = Seq("q31_table_counts", "q54_minmax_stats").map { name =>
      SparkEntry.resetStatsCaches()
      name -> run(name, SparkEntry.queries(name), "first")
    }
    // EVERY rep counts toward the failure contract — a first-computation
    // throw (e.g. the pushdown require tripping only on the uncached path)
    // must not read as a fast bench with a clean exit
    val failed =
      (cold ++ warm ++ firstComputation).collect { case (n, (_, Some(_))) => n }.distinct.sorted

    def timesJson(xs: Seq[(String, (Double, Option[String]))]): String =
      xs.map { case (k, (v, _)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = cold.map(_._2._1).sum
    val failedJson = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val json =
      s"""{"metric":"total","value":$total,"unit":"sec","queries":${timesJson(cold)},""" +
        s""""warm":${timesJson(warm)},""" +
        s""""first_computation":${timesJson(firstComputation)},""" +
        s""""failed":$failedJson,"sf":"$sfDir"}"""
    // Machine-readable copies: a file the harness can always read, plus the
    // bare JSON as the FINAL stdout line (after spark.stop(), so no late
    // executor log lines can interleave; build.sbt passes forked stdout
    // through unprefixed and suppresses the [success] trailer).
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH.out.json"), json + "\n")
    spark.stop()
    println(json)
    if (failed.nonEmpty) sys.exit(1)
  }
}
