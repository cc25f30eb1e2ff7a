package graft

/** Dev harness: interleaved A/B of ONE session conf over a query list
  * (`runMain graft.DevConfAb <confKey> <valA> <valB> [sfDir] [reps] [q1,q2,..]`)
  * — both arms run inside one JVM, alternating per rep, so box noise hits
  * them equally; min over reps per arm reported. Timing mirrors Bench
  * (`queryExecution.toRdd.count()`, clearCache + blocking unpersist of
  * leftover checkpoint blocks outside the timed window).
  */
object DevConfAb {
  def main(args: Array[String]): Unit = {
    val confKey = args(0)
    val valA = args(1)
    val valB = args(2)
    val sfDir = if (args.length > 3) args(3) else "/root/testdata/sf0.1"
    val reps = if (args.length > 4) args(4).toInt else 3
    val names =
      if (args.length > 5) args(5).split(",").map(_.trim).filter(_.nonEmpty).toSeq
      else Seq("q92_lm_quality", "q104_lm_kn", "q106_lm_kn3", "q109_lm_kn5")
    val modes = Seq("A" -> valA, "B" -> valB)
    val spark = Bench.benchSession()
    val best = scala.collection.mutable.Map.empty[(String, String), Double]
    for (rep <- 1 to reps; name <- names; (label, v) <- modes) {
      spark.conf.set(confKey, v)
      spark.sparkContext.setJobDescription(s"confab $name $label rep$rep")
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir).queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(blocking = true))
      System.err.println(f"[confab] rep$rep $name $label $sec%.3f s")
      val k = (name, label)
      best(k) = math.min(best.getOrElse(k, Double.MaxValue), sec)
    }
    println(s"CONF_AB $confKey A=$valA B=$valB sfDir=$sfDir reps=$reps")
    for (name <- names)
      println(f"CONF_AB $name A=${best((name, "A"))}%.3f B=${best((name, "B"))}%.3f")
    spark.stop()
  }
}
