package graft

import org.apache.spark.sql.functions._

/** Dev probe: the q110 clustered-manifold geometry under the
  * [[graft.operators.Dedup.semAssignPruned]] gate
  * (`runMain graft.DevQ110Probe [sfDir]`) — prints the kept-candidate
  * fraction the adaptive gate measures on the EXACT in-query derived
  * vectors q110 assigns, beside the isotropic shipped fixture's, so the
  * committed rung shows candidates-kept ≪ K where the geometry allows
  * pruning and ≈ K where it cannot (VERDICT r15 next #3's probe
  * artifact).
  */
object DevQ110Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(master = "local[32]", appName = "q110-probe")
    spark.sparkContext.setLogLevel("WARN")
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    // the q110 derivation, token-for-token
    val dv = emb.select(col("vec_id"), expr(
      """transform(sequence(0, 15), j ->
        |  CAST(CASE WHEN j = CAST(vec_id % 8 AS INT) THEN 1.0
        |       ELSE ((vec_id * (j + 7)) % 11 - 5) / 64.0 END AS FLOAT))"""
        .stripMargin).as("vec"))
    val k = 64L
    val g = 8
    def probe(label: String, e: org.apache.spark.sql.DataFrame,
        idCol: String, vecCol: String,
        cents: org.apache.spark.sql.DataFrame): Unit = {
      val grouped = graft.operators.Dedup.semPruneGeometry(
        cents.select(col("centroid_id"), col("cvec")), g, k, 42L)
      val frac = graft.operators.Dedup.semPruneKeptFrac(
        e.select(col(vecCol).as("vec"))
          .limit(graft.operators.Dedup.SemPruneProbeRows),
        grouped, k)
      val gate = if (frac > graft.operators.Dedup.SemPruneGateMaxKeptFrac)
        "EXHAUSTIVE" else "PRUNED"
      println(f"Q110_PROBE $label K=$k G=$g keptFrac=$frac%.3f " +
        f"candsKept=${frac * k}%.1f gate=$gate")
    }
    probe("clustered(q110)", dv, "vec_id", "vec",
      graft.operators.Dedup.firstKCentroids(dv, "vec_id", "vec", 64))
    probe("isotropic(shipped)", emb, "vec_id", "embedding",
      graft.operators.Dedup.firstKCentroids(emb, "vec_id", "embedding", 64))
    spark.stop()
  }
}
