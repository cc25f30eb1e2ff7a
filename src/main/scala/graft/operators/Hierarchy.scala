package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** J7 — iterative hierarchy resolution (the reference's two-phase docs
  * migration, `etl/orchestrator.py:743-1000`): folders are resolved
  * level-by-level (each level joins against the accumulated path→id map of
  * all shallower levels), then leaves resolve their containing path with a
  * miss→root fallback (`orchestrator.py:914-923`).
  *
  * The loop runs on the driver but every step is a distributed join; depth
  * is data-dependent and tiny (path depth, not row count). `localCheckpoint`
  * bounds lineage growth across iterations (SURVEY.md §7.4 risk 4).
  */
object Hierarchy {

  /** One-join parent resolution for trees whose ids are already assigned
    * (the engine's normal case — ids are deterministic, SURVEY.md §2.5).
    * The reference's level-by-level loop exists only because its sink
    * assigns serial ids during the walk; with pre-assigned ids,
    * `parent_id = self-join on (parent_path = path)` with miss→root gives
    * the identical result for any well-formed tree (parent shallower than
    * child) in a single join — no iteration, no checkpoints. The build side
    * is pre-shrunk to candidate parents (see below) and broadcast is left
    * to AQE. Use [[resolveParents]] only when ids must be minted
    * level-by-level.
    */
  def resolveParentsDirect(
      nodes: DataFrame,
      idCol: String,
      pathCol: String,
      parentPathCol: String,
      depthCol: String,
      rootId: Long = 0L): DataFrame = {
    // Build side = candidate parents ONLY: a node can be a parent iff its
    // path appears as some node's parent path, so the semi-join strips every
    // leaf. For a docs-style tree the surviving set is the internal-node
    // (folder) table — dim-sized — where the full node table is the corpus.
    // No forced broadcast hint: AQE sees the post-semi-join size at runtime
    // and picks broadcast when it actually fits, instead of trusting a
    // compile-time hint that OOMs executors at 100 TB.
    val parentPaths = nodes.select(col(parentPathCol).as("__h_path")).distinct()
    val parents = nodes
      .select(col(pathCol).as("__h_path"), col(idCol).as("__h_pid"))
      .join(parentPaths, Seq("__h_path"), "left_semi")
    nodes
      .join(parents, nodes(parentPathCol) === col("__h_path"), "left")
      .withColumn("parent_id",
        when(col(depthCol) === 0, lit(rootId))
          .otherwise(coalesce(col("__h_pid"), lit(rootId))))
      .drop("__h_path", "__h_pid")
  }

  /** Resolve `childCol` (a parent path string) to the parent's id.
    *
    * @param nodes     one row per node with `idCol`, `pathCol` (the node's own
    *                  full path) and `childCol` (the path of its parent)
    * @param depthCol  precomputed depth of the node's own path
    * @return nodes with `parent_id` (missing parent → `rootId`)
    */
  def resolveParents(
      nodes: DataFrame,
      idCol: String,
      pathCol: String,
      parentPathCol: String,
      depthCol: String,
      rootId: Long = 0L,
      checkpointEvery: Int = 3): DataFrame = {
    val maxRow = nodes.agg(max(col(depthCol)).cast("int")).head()
    val maxDepth = if (maxRow.isNullAt(0)) -1 else maxRow.getInt(0)
    // accumulated (path -> id) map of all levels resolved so far
    var pathToId = nodes
      .filter(col(depthCol) === 0)
      .select(col(pathCol).as("__h_path"), col(idCol).as("__h_pid"))
      .localCheckpoint()
    var out = nodes
      .filter(col(depthCol) === 0)
      .withColumn("parent_id", lit(rootId))

    var d = 1
    while (d <= maxDepth) {
      val level = nodes.filter(col(depthCol) === d)
      val resolved = level
        .join(broadcast(pathToId), level(parentPathCol) === col("__h_path"), "left")
        .withColumn("parent_id", coalesce(col("__h_pid"), lit(rootId)))
        .drop("__h_path", "__h_pid")
      out = out.unionByName(resolved)
      pathToId = pathToId.unionByName(
        level.select(col(pathCol).as("__h_path"), col(idCol).as("__h_pid")))
      if (d % checkpointEvery == 0) {
        pathToId = pathToId.localCheckpoint()
        out = out.localCheckpoint()
      }
      d += 1
    }
    out
  }
}
