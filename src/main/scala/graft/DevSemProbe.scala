package graft

import org.apache.spark.sql.functions._

/** Dev probe: how selective is [[graft.operators.Dedup.semAssignPruned]]'s
  * triangle-inequality bound on a given corpus
  * (`runMain graft.DevSemProbe [sfDir] [numGroups]`)? Reports the
  * distribution of per-vector CANDIDATE CHILDREN (centroids whose group
  * survives the ub/lb filter) against K — candidates ≈ K means the bound
  * prunes nothing (groups too wide: r_g ≈ the inter-centroid spread), and
  * the pruned path degenerates to the exhaustive scan plus overhead.
  */
object DevSemProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val numGroups = if (args.length > 1) args(1).toInt else 0
    val spark = Engine.session(master = "local[32]", appName = "sem-probe")
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.Vectors
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val n = emb.count()
    val centroids = graft.operators.Dedup
      .semCentroidsFor(emb, "vec_id", "embedding", n, numCentroids = 0, seed = 42L)
      .localCheckpoint(true)
    val k = centroids.count()
    val g = if (numGroups > 0) numGroups
      else math.max(2, math.ceil(math.sqrt(k.toDouble)).toInt)
    val supers = graft.operators.Similarity
      .trainCentroids(centroids, "cvec", g, k, 42L)
      .select(col("centroid_id").as("__gid"), col("cvec").as("__gvec"))
    val childAsg = graft.operators.Dedup.semAssign(
        centroids.select(col("centroid_id").as("__cid"), col("cvec")),
        "__cid", "cvec",
        supers.select(col("__gid").as("centroid_id"), col("__gvec").as("cvec")))
      .select(col("id").as("__cid"), col("vec").as("__cvec"),
        col("centroid_id").as("__gid"))
    val geo = childAsg
      .join(supers, Seq("__gid"))
      .withColumn("__dc",
        sqrt(greatest(
          lit(2.0) - lit(2.0) * Vectors.cosine(col("__cvec"), col("__gvec")) + lit(1e-9),
          lit(0.0))))
      .groupBy(col("__gid"))
      .agg(first(col("__gvec")).as("__gvec"),
        max(col("__dc")).as("__r"), min(col("__dc")).as("__rmin"),
        count(lit(1)).as("__nc"))
    geo.select(col("__gid"), round(col("__r"), 3).as("r"),
        round(col("__rmin"), 3).as("rmin"), col("__nc"))
      .orderBy("__gid").show(50, truncate = false)
    val grouped = geo.agg(collect_list(
      struct(col("__gvec"), col("__r"), col("__rmin"), col("__nc"))).as("__groups"))
    val stats = emb.select(col("embedding").as("vec"))
      .crossJoin(broadcast(grouped))
      .withColumn("__gb", transform(col("__groups"), grp => {
        val dg = sqrt(greatest(
          lit(2.0) - lit(2.0) * Vectors.cosine(col("vec"), grp.getField("__gvec")),
          lit(0.0)))
        struct(
          (lit(1.0) - pow(greatest(dg - grp.getField("__r"), lit(0.0)), 2) / 2).as("ub"),
          (lit(1.0) - pow(dg + grp.getField("__rmin"), 2) / 2).as("lb"),
          grp.getField("__nc").as("nc"))
      }))
      .withColumn("__bestlb", array_max(transform(col("__gb"), x => x.getField("lb"))))
      .withColumn("__cands",
        aggregate(
          filter(col("__gb"), x => x.getField("ub") >= col("__bestlb") - lit(1e-6)),
          lit(0L), (acc, x) => acc + x.getField("nc")))
      .agg(avg(col("__cands")).as("avg"),
        expr("percentile_approx(__cands, 0.5)").as("p50"),
        expr("percentile_approx(__cands, 0.99)").as("p99"),
        max(col("__cands")).as("max"))
      .head()
    println(f"SEM_PROBE n=$n K=$k G=$g avgCands=${stats.getDouble(0)}%.1f " +
      s"p50=${stats.get(1)} p99=${stats.get(2)} max=${stats.get(3)}")
    spark.stop()
  }
}
