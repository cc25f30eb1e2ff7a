package graft

import org.apache.spark.sql.functions._

import graft.model.Destination
import graft.run.{MetricsCollector, Pipeline}

/** S13/A8: observation metrics ride along the frame's action. */
class MetricsSpec extends SparkSpecBase {
  import spark.implicits._

  test("observeRows delivers counts through the listener without extra jobs") {
    val mc = new MetricsCollector(spark)
    try {
      val df = mc.observeRows((1 to 57).toDF("v").filter(col("v") % 2 === 1), "odd_rows")
      df.write.mode("overwrite")
        .parquet(java.nio.file.Files.createTempDirectory("graft-metrics").toString + "/t")
      val got = mc.await("odd_rows")
      assert(got.isDefined, "observation not delivered")
      assert(got.get("rows") === 29L)
    } finally mc.close()
  }

  test("pipeline row counts arrive via observe on the sink action, no count pass") {
    val mc = new MetricsCollector(spark)
    try {
      val tmp = java.nio.file.Files.createTempDirectory("graft-pipe-obs").toString
      val pipe = new Pipeline(spark, _ => (1 to 13).toDF("n"),
        Pipeline.parquetSink(tmp), collector = Some(mc))
      pipe.run(Map("province" -> ((src, _) => Map(Destination.Postgres -> src))))
      // the count was DELIVERED through the observation listener — the sink
      // write was the only action on the frame
      assert(mc.snapshot.get("province/postgres").map(_("rows")) === Some(13L))
      assert(pipe.report === Map("province/postgres" -> 13L))
    } finally mc.close()
  }
}
