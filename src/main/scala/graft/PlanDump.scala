package graft

/** Dev harness: print the formatted physical plan of one SparkEntry query
  * (`runMain graft.PlanDump <query> [sfDir]`) — the `.explain` feedback loop
  * for checking pushdown / broadcast / exchange-reuse / codegen spans.
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.01"
    val spark = Engine.session(
      master = s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")}]",
      shufflePartitions = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8").toInt,
      appName = "graft-plan")
    // GRAFT_CONF="k=v;k=v" — session confs to set before planning, so one
    // build can dump both arms of a conf-gated plan change (spread gate,
    // closure route) for the plans/ before/after record
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    // comma-separated names: one JVM dumps a whole touched-query list
    // (each plan delimited for the splitter that writes plans/rNN files)
    name.split(",").map(_.trim).filter(_.nonEmpty).foreach { q =>
      println(s"==== PLAN $q ====")
      SparkEntry.queries(q)(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
