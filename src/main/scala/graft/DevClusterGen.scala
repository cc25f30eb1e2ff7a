package graft

import org.apache.spark.sql.functions._

/** Dev harness: synthesize MANIFOLD-STRUCTURED embeddings
  * (`runMain graft.DevClusterGen [outDir] [n] [clusters] [dim] [noise]`)
  * — the geometry real semantic embeddings have (text/image encoders map
  * inputs onto a low-dimensional manifold of concept clusters), as
  * opposed to the shipped synthetic `embeddings.parquet`, whose vectors
  * are ISOTROPIC on the 64-sphere: there, inter-centroid distances sit
  * near orthogonal (measured r_g ≈ 1.28 vs √2), every triangle-inequality
  * upper bound evaluates ≈ 1, and NO exact metric pruning — two-level,
  * Elkan, or otherwise — can skip a candidate (dev/r15/sem_probe_iso.log:
  * 448/448 candidates survive the bound). Clustered data is where
  * [[graft.operators.Dedup.semAssignPruned]]'s bound actually bites.
  *
  * Deterministic construction (no RNG state): `clusters` unit-normalized
  * centers with hash-derived coordinates; vector i sits on center
  * (i mod clusters) plus `noise`-scaled hash-derived jitter.
  */
object DevClusterGen {
  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "/tmp/clustered"
    val n = if (args.length > 1) args(1).toLong else 200000L
    val clusters = if (args.length > 2) args(2).toInt else 512
    val dim = if (args.length > 3) args(3).toInt else 64
    val noise = if (args.length > 4) args(4).toDouble else 0.08
    val spark = Engine.session(master = "local[32]", appName = "cluster-gen")
    spark.sparkContext.setLogLevel("WARN")
    // center coordinate: a deterministic pseudo-gaussian via summed sines
    // of the (cluster, dim) key; jitter likewise keyed by (row, dim)
    val vec = expr(
      s"""transform(sequence(0, ${dim - 1}), j -> CAST(
         |  sin(CAST((id % $clusters) * 7919 + j * 104729 AS DOUBLE)) +
         |  sin(CAST((id % $clusters) * 15485863 + j * 32452843 AS DOUBLE)) +
         |  $noise * sin(CAST(id * 2654435761 + j * 40503 AS DOUBLE))
         |  AS FLOAT))""".stripMargin)
    spark.range(n)
      .select(col("id").as("vec_id"), vec.as("embedding"))
      .coalesce(16)
      .write.mode("overwrite").parquet(s"$out/embeddings.parquet")
    println(s"CLUSTER_GEN out=$out n=$n clusters=$clusters dim=$dim noise=$noise")
    spark.stop()
  }
}
