package graft

import org.apache.spark.sql.functions._

/** Dev probe: per-stage wall breakdown of the SemDeDup pipeline at scale
  * (`runMain graft.DevSemStageProfile [sfDir] [threshold]`) — assignment,
  * intra-cell candidate pairs (the guarded join + vector join-backs +
  * cosine gate), transitive closure, and the keep rule, each timed
  * against its own materialization so the next optimization targets the
  * real bottleneck instead of a guess.
  */
object DevSemStageProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val threshold = if (args.length > 1) args(1).toDouble else 0.35
    val spark = Engine.session(master = "local[32]", appName = "sem-stage-profile")
    // GRAFT_CONF="k=v;k=v" — extra session confs (A/B the conf-gated paths)
    sys.env.get("GRAFT_CONF").foreach(_.split(";").filter(_.contains("="))
      .foreach { kv =>
        val Array(k, v) = kv.split("=", 2)
        spark.conf.set(k.trim, v.trim)
      })
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"SEM_STAGE $label sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      r
    }
    val centroids = timed("kmeans") {
      graft.operators.Dedup
        .semCentroidsFor(emb, "vec_id", "embedding", n, numCentroids = 0, seed = 42L)
        .localCheckpoint(true)
    }
    val asg = timed("assign") {
      graft.operators.Dedup
        .semAssignPruned(emb, "vec_id", "embedding", centroids)
        .localCheckpoint(true)
    }
    val pairs = timed("pairs") {
      graft.operators.Dedup.semPairsFromAssignHook(asg, threshold)
        .localCheckpoint(true)
    }
    println(s"SEM_STAGE pairs_rows=${pairs.count()}")
    val comps = timed("closure") {
      graft.operators.Dedup.connectedComponents(pairs).localCheckpoint(true)
    }
    val survivors = timed("keep") {
      asg.join(comps, Seq("id"), "left")
        .withColumn("comp", coalesce(col("comp"), col("id")))
        .groupBy(col("comp"))
        .agg(min(struct(col("cosc"), col("id"))).as("__m"))
        .select(col("__m.id"))
        .count()
    }
    println(s"SEM_STAGE n=$n survivors=$survivors")
    spark.stop()
  }
}
