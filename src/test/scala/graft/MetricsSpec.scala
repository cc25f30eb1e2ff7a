package graft

import org.apache.spark.sql.functions._

import graft.run.MetricsCollector

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
}
