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
    val spark = Engine.session(master = "local[32]", appName = "sem-ladder")
    spark.sparkContext.setLogLevel("WARN")
    val mc = new graft.run.MetricsCollector(spark)
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
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
