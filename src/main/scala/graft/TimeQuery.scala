package graft

/** Dev harness: time one SparkEntry query N times in a warm JVM
  * (`runMain graft.TimeQuery <query> [sfDir] [reps]`). Cuts JVM-startup noise
  * out of A/B comparisons that a fresh `Bench` run can't distinguish.
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val reps = if (args.length > 2) args(2).toInt else 3
    val spark = Engine.session(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-time")
    // toRdd.count(), not Dataset.count(): a stacked count aggregate lets
    // the optimizer prune unevaluated projections (see Bench.run)
    for (q <- name.split(','); i <- 1 to reps) {
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(q)(spark, sfDir).queryExecution.toRdd.count()
      println(f"TIMING $q rep=$i rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
