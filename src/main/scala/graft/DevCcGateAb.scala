package graft

/** Dev harness: A/B the connectedComponents closure-route gate
  * (`runMain graft.DevCcGateAb [sfDir] [reps] [q1,q2,...]`) over the
  * closure-tailed bench queries, modes interleaved in ONE JVM so box
  * noise hits all arms equally:
  *
  *   - contract — localClosureMaxEdges 0: always pre-contract + loop
  *                (the ungated r16 mid-build path)
  *   - local    — localClosureMaxEdges MaxValue: always the single-task
  *                union-find closure (the shipped route for every graph
  *                ≤ 2^22 sym edges)
  *
  * Timing mirrors Bench exactly: `queryExecution.toRdd.count()` consumption,
  * clearCache + blocking unpersist of leftover checkpoint blocks OUTSIDE
  * the timed window, min over reps reported.
  */
object DevCcGateAb {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val names =
      if (args.length > 2) args(2).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq(
        "q45_dedup_components", "q63_curation64", "q65_curation_transitive",
        "q66_curation_production", "q69_containment_curated",
        "q72_containment_production", "q94_train_prep_lm", "q103_sem_dedup")
    val modes = Seq(
      "contract" -> "0",                       // force contraction + loop
      "local" -> Long.MaxValue.toString)       // force single-task closure
    val spark = Bench.benchSession()
    if (sys.env.get("GRAFT_CC_LOG_EDGES").contains("1"))
      spark.conf.set("spark.graft.cc.logEdges", "true")
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (rep <- 1 to reps; name <- names; (label, thr) <- modes) {
      spark.conf.set("spark.graft.cc.localClosureMaxEdges", thr)
      spark.sparkContext.setJobDescription(s"ccgate $name $label rep$rep")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.err.println(f"[ccgate] rep$rep $name $label $sec%.3f s")
      val k = (name, label)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
    }
    println(f"CC_GATE_AB sfDir=$sfDir reps=$reps")
    for (name <- names) {
      val row = modes.map { case (l, _) => f"$l=${best((name, l))}%.3f" }.mkString(" ")
      println(s"CC_GATE_AB $name $row")
    }
    spark.stop()
  }
}
