package graft

import graft.operators.Hierarchy

/** J7: level-by-level path resolution with the reference's miss→root
  * fallback (`etl/orchestrator.py:914-923`).
  */
class HierarchySpec extends SparkSpecBase {
  import spark.implicits._

  test("resolves parents level by level; missing parent falls back to root") {
    val nodes = Seq(
      ("/", 1L, 0, null.asInstanceOf[String]),
      ("/a", 2L, 1, "/"),
      ("/b", 3L, 1, "/"),
      ("/a/x", 4L, 2, "/a"),
      ("/a/x/deep", 5L, 3, "/a/x"),
      ("/orphan/child", 6L, 2, "/orphan") // parent path never defined
    ).toDF("path", "id", "depth", "parent_path")
    val out = Hierarchy.resolveParents(nodes, "id", "path", "parent_path", "depth",
        rootId = 0L, checkpointEvery = 2)
      .orderBy("id").collect()
    val parents = out.map(r => r.getLong(r.fieldIndex("parent_id"))).toSeq
    assert(parents === Seq(0L, 1L, 1L, 2L, 4L, 0L))
  }

  test("direct (single-join) resolution matches the iterative loop") {
    val nodes = Seq(
      ("/", 1L, 0, null.asInstanceOf[String]),
      ("/a", 2L, 1, "/"),
      ("/a/x", 4L, 2, "/a"),
      ("/orphan/child", 6L, 2, "/orphan")
    ).toDF("path", "id", "depth", "parent_path")
    val loop = Hierarchy.resolveParents(nodes, "id", "path", "parent_path", "depth", 0L)
      .select("id", "parent_id").orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    val direct = Hierarchy.resolveParentsDirect(nodes, "id", "path", "parent_path", "depth", 0L)
      .select("id", "parent_id").orderBy("id").collect().map(r => (r.getLong(0), r.getLong(1)))
    assert(direct.toSeq === loop.toSeq)
  }

  test("direct resolution builds from candidate parents only, never a forced broadcast") {
    import org.apache.spark.sql.functions.col
    val nodes = Seq(
      ("/", 1L, 0, null.asInstanceOf[String]),
      ("/a", 2L, 1, "/"),
      ("/a/x", 4L, 2, "/a"),
      ("/a/y", 5L, 2, "/a"),
      ("/b", 6L, 1, "/")
    ).toDF("path", "id", "depth", "parent_path")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val out = Hierarchy.resolveParentsDirect(nodes, "id", "path", "parent_path", "depth", 0L)
      // with broadcast declared impossible (≙ the node table measured at
      // 100 TB) the plan must still work: no forced-broadcast hint survives
      val physical = out.queryExecution.executedPlan.toString
      assert(!physical.contains("BroadcastHashJoin"),
        s"parent resolution must not force-broadcast the node table:\n$physical")
      // and the build side is the semi-joined candidate-parent set (leaves
      // stripped), not every node
      val optimized = out.queryExecution.optimizedPlan.toString
      assert(optimized.contains("LeftSemi"),
        s"expected a candidate-parent semi-join in:\n$optimized")
      val parents = out.orderBy(col("id")).collect()
        .map(r => r.getLong(r.fieldIndex("parent_id"))).toSeq
      assert(parents === Seq(0L, 1L, 2L, 2L, 1L))
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("single-level input degenerates to all-root") {
    val nodes = Seq(("/x", 7L, 0, null.asInstanceOf[String]))
      .toDF("path", "id", "depth", "parent_path")
    val out = Hierarchy.resolveParents(nodes, "id", "path", "parent_path", "depth", rootId = 9L)
      .collect()
    assert(out.head.getLong(out.head.fieldIndex("parent_id")) === 9L)
  }
}
