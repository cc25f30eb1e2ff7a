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
