package graft

import org.apache.spark.sql.{DataFrame}
import org.apache.spark.sql.functions._

/** Dev harness: the dedup ladder (q16/q17/q25/q38/q45) at large scale
  * factors (`runMain graft.DevScaleLadder [sfDir] [outDir]`) — VERDICT r6
  * #4's 100× drive.
  *
  * At 100× the corpus' largest HONEST bucket (~2,010 docs at 10×) passes
  * the 4096 guard threshold, so the guard legitimately activates on real
  * data for the first time: this runner therefore records, per rung,
  * wall time, output rows, and every `lsh_bucket_guard_*` observed metric
  * (star/rep/sub-split/drop), and writes the q45 labels where
  * `dev/cc_check.py` expects them so the union-find oracle can adjudicate
  * whether the guarded (bounded-work) pair set still reaches the plain
  * closure's components.
  */
object DevScaleLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val outDir = if (args.length > 1) args(1) else "/tmp/ladder_out"
    // 100× on one JVM needs the brief's spill-aware sizing: a flat 32
    // shuffle partitions put an entire replica-cluster pair aggregation in
    // one task (AGGREGATE_OUT_OF_MEMORY at 64 g). Engine.session now sets
    // AQE initialPartitionNum = 8x partitions, so the base count stays at
    // core count and oversized stages fan out to 256 on their own; the arg
    // remains for A/Bing the sizing itself.
    val partitions = if (args.length > 2) args(2).toInt else 32
    val spark = Engine.session(master = "local[32]", shufflePartitions = partitions,
      appName = "ladder")
    spark.sparkContext.setLogLevel("WARN")
    new java.io.File(outDir).mkdirs()
    val mc = new graft.run.MetricsCollector(spark)

    // CONSUME VIA A DATASET ACTION, never `queryExecution.toRdd.count()`:
    // observed metrics (the guard counters this runner exists to surface)
    // are computed by the plan's CollectMetrics accumulators but DELIVERED
    // only through QueryExecutionListener.onSuccess, which fires for
    // Dataset-API actions — an RDD-level consume runs the plan and then
    // silently reports guard=[] even when every bucket was guarded (caught
    // at 100×: q25's 16 fixed sign buckets of ~31k rows each showed empty).
    // The noop sink executes the full physical plan; the row count rides an
    // extra observe instead of a second action.
    def drive(name: String)(df: => DataFrame): Unit = {
      val before = mc.snapshot.keySet
      val rowsObs = s"ladder_rows_$name"
      val t0 = System.nanoTime()
      mc.observeRows(df, rowsObs).write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val rows = mc.await(rowsObs).map(_("rows")).getOrElse(-1L)
      val guards = mc.snapshot.toSeq
        .filter { case (k, _) => k.startsWith("lsh_bucket_guard_") && !before(k) }
        .flatMap { case (k, fields) =>
          fields.toSeq.collect {
            case (f, v: Long) if v != 0L => s"${k.split("_").last}.$f=$v"
            case (f, v: Double) if v != 0.0 => f"${k.split("_").last}.$f=$v%.2f"
          }
        }
      println(f"LADDER $name rows=$rows sec=$sec%.1f guard=[${guards.sorted.mkString(", ")}]")
      // free the finished rung's checkpoint blocks before the next timer
      // starts (same debris-isolation teardown as Bench — see its comment)
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.gc()
    }

    drive("q16_dedup_exact")(SparkEntry.queries("q16_dedup_exact")(spark, sfDir))
    drive("q17_minhash_lsh_pairs")(SparkEntry.queries("q17_minhash_lsh_pairs")(spark, sfDir))
    // md5-vs-xxhash64 LSH A/B: q61 is q17's scale twin (one xxhash64 per
    // shingle, long band keys) — same corpus, same band geometry as its
    // SparkEntry entry, so the delta is the hashing + shuffle-width win.
    drive("q61_minhash64_pairs")(SparkEntry.queries("q61_minhash64_pairs")(spark, sfDir))
    drive("q25_embedding_neardup")(SparkEntry.queries("q25_embedding_neardup")(spark, sfDir))
    drive("q38_embedding_band_lsh")(SparkEntry.queries("q38_embedding_band_lsh")(spark, sfDir))
    locally {
      // q45 keeps a real parquet write (its own Dataset action — metrics
      // deliver the same way): dev/cc_check.py reads the labels from disk.
      val before = mc.snapshot.keySet
      val t0 = System.nanoTime()
      val labels = SparkEntry.queries("q45_dedup_components")(spark, sfDir)
      labels.coalesce(1).write.mode("overwrite").parquet(s"$outDir/q45_dedup_components")
      val rows = spark.read.parquet(s"$outDir/q45_dedup_components").count()
      val sec = (System.nanoTime() - t0) / 1e9
      Thread.sleep(300) // listener delivery is async
      val guards = mc.snapshot.toSeq
        .filter { case (k, _) => k.startsWith("lsh_bucket_guard_") && !before(k) }
        .flatMap { case (k, fields) =>
          fields.toSeq.collect {
            case (f, v: Long) if v != 0L => s"${k.split("_").last}.$f=$v"
            case (f, v: Double) if v != 0.0 => f"${k.split("_").last}.$f=$v%.2f"
          }
        }
      println(f"LADDER q45_dedup_components rows=$rows sec=$sec%.1f " +
        f"guard=[${guards.sorted.mkString(", ")}]")
    }
    mc.close()
    spark.stop()
  }
}
