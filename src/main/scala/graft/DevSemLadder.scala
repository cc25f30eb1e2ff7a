package graft

/** Dev harness: SemDeDup at corpus scale
  * (`runMain graft.DevSemLadder [sfDir] [threshold]`) — the production
  * path ([[graft.operators.Dedup.semDedupAuto]]: KMeans centroids,
  * K ≈ √n, guard-bounded cells) over the full embeddings table, printing
  * wall time, survivor count, and any `lsh_bucket_guard_*` activations
  * (a replica-heavy corpus's oversized cells must disclose their
  * star-collapse here exactly as the hash-bucket tiers do).
  */
object DevSemLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val threshold = if (args.length > 1) args(1).toDouble else 0.35
    val numGroups = if (args.length > 2) args(2).toInt else 0
    val spark = Engine.session(master = "local[32]", appName = "sem-ladder")
    spark.sparkContext.setLogLevel("WARN")
    val mc = new graft.run.MetricsCollector(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()

    // assignment A/B (VERDICT r14 next #2): the SAME learned centroids
    // under the exhaustive map-side argmax vs the two-level pruned path —
    // wall for the dominant O(n·K) term, and row identity (the pruning is
    // EXACT by the triangle-inequality bound; this pins it at corpus scale
    // on learned centroids, where the spec pins it on random fixtures)
    val centroids = graft.operators.Dedup
      .semCentroidsFor(emb, "vec_id", "embedding", n, numCentroids = 0, seed = 42L)
      .localCheckpoint(true)
    val k = centroids.count()
    def timeAssign(label: String, asg: org.apache.spark.sql.DataFrame): Unit = {
      val t = System.nanoTime()
      asg.select("id", "centroid_id", "cosc").write.mode("overwrite")
        .format("noop").save()
      val sec = (System.nanoTime() - t) / 1e9
      println(f"SEM_LADDER assign $label n=$n K=$k sec=$sec%.1f")
    }
    timeAssign("exhaustive",
      graft.operators.Dedup.semAssign(emb, "vec_id", "embedding", centroids))
    timeAssign("pruned",
      graft.operators.Dedup.semAssignPruned(emb, "vec_id", "embedding", centroids,
        numGroups = numGroups))
    val diff = graft.operators.Dedup.semAssign(emb, "vec_id", "embedding", centroids)
      .select("id", "centroid_id", "cosc")
      .exceptAll(graft.operators.Dedup
        .semAssignPruned(emb, "vec_id", "embedding", centroids, numGroups = numGroups)
        .select("id", "centroid_id", "cosc"))
      .count()
    println(s"SEM_LADDER assign identity exhaustive-vs-pruned exceptAll=$diff " +
      (if (diff == 0L) "IDENTICAL" else "DIVERGED"))

    val before = mc.snapshot.keySet
    val t0 = System.nanoTime()
    val survivors = graft.operators.Dedup
      .semDedupAuto(emb, "vec_id", "embedding", threshold)
      .count()
    val sec = (System.nanoTime() - t0) / 1e9
    if (!org.apache.spark.GraftListenerBridge.waitListenerBusEmpty(spark.sparkContext))
      System.err.println("[sem-ladder] warning: listener bus did not drain")
    val guards = mc.snapshot.toSeq
      .filter { case (k, _) => k.startsWith("lsh_bucket_guard_") && !before(k) }
      .flatMap { case (k, fields) =>
        fields.toSeq.collect { case (f, v: Long) if v != 0L => s"$f=$v" }
      }
    println(f"SEM_LADDER n=$n threshold=$threshold survivors=$survivors " +
      f"sec=$sec%.1f guard=[${guards.sorted.mkString(", ")}]")
    mc.close()
    spark.stop()
  }
}
