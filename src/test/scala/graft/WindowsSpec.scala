package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.Windows

/** Event-time windows + sessionization on constructed timelines. */
class WindowsSpec extends SparkSpecBase {
  import spark.implicits._

  private def ts(minute: Int, sec: Int = 0): Timestamp =
    Timestamp.valueOf(f"2024-01-01 00:$minute%02d:$sec%02d")

  test("tumbling: events land in their 10-minute bucket") {
    val events = Seq((1L, ts(0), "a"), (2L, ts(9, 59), "a"), (3L, ts(10), "a"), (4L, ts(25), "b"))
      .toDF("event_id", "ts", "event_type")
    val out = Windows.tumbling(events, "ts", "10 minutes", Seq("event_type"),
        Seq(count(lit(1)).as("n")))
      .orderBy("window_start", "event_type").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(2L, 1L, 1L))
  }

  test("sliding: each event appears in width/slide windows") {
    val events = Seq((1L, ts(15), "a")).toDF("event_id", "ts", "event_type")
    val out = Windows.sliding(events, "ts", "30 minutes", "10 minutes", Seq("event_type"),
      Seq(count(lit(1)).as("n"))).collect()
    assert(out.length === 3)
  }

  test("bounded-frame window: per-task input is exactly its own partition keys' rows " +
    "(skewed fixture)") {
    // The q34 scale pin (VERDICT r5 #5): Window.partitionBy(key) must
    // hash-colocate each key's rows into ONE task and give no task anything
    // beyond its own keys' rows — the 100 TB failure modes are (a) a plan
    // degenerating to a single-partition global sort and (b) a key split
    // across tasks (wrong frames). Fixture: one hot key with 90% of rows +
    // 500 cold keys, pre-scattered over 8 input partitions.
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.execution.window.WindowExec
    val hot = spark.range(90000L).select(lit(7L).as("s"), col("id").as("v"))
    val cold = spark.range(10000L).select((col("id") % 500L + 100L).as("s"), col("id").as("v"))
    val df = hot.unionByName(cold).repartition(8)
    val w = Window.partitionBy("s").orderBy("v").rowsBetween(-2, 0)
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan exposes the exec
    try {
      val out = df.withColumn("rolling", sum(col("v")).over(w))
      out.collect()
      val win = out.queryExecution.executedPlan.collect { case we: WindowExec => we }.head
      val sIdx = win.child.output.indexWhere(_.name == "s")
      // per-partition key sets of the window's ACTUAL input (post-shuffle)
      val perPart = win.child.execute()
        .mapPartitionsWithIndex { (i, it) =>
          val keys = scala.collection.mutable.Set.empty[Long]
          var n = 0L
          it.foreach { r => keys += r.getLong(sIdx); n += 1 }
          if (n == 0) Iterator.empty else Iterator((i, keys.toSet, n))
        }.collect()
      assert(perPart.length > 1, "window input collapsed to a single task")
      // no key is split across tasks ⇒ each task's input = its keys' rows
      val allKeys = perPart.flatMap(_._2)
      assert(allKeys.length === allKeys.distinct.length,
        s"a partition key appeared in more than one task")
      assert(perPart.map(_._3).sum === 100000L)
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }

  test("sessionize: gap splits sessions, ties broken deterministically") {
    val events = Seq(
      (1L, "u1", ts(0)), (2L, "u1", ts(10)),          // same session (gap 600 <= 900)
      (3L, "u1", ts(40)),                              // new session (gap 1800 > 900)
      (4L, "u2", ts(5)))
      .toDF("event_id", "user_id", "ts")
    val out = Windows.sessionize(events, "user_id", "ts", "event_id", 900L)
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(3)).toSeq === Seq(1L, 1L, 2L, 1L))
  }
}
