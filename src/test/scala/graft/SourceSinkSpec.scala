package graft

import org.apache.spark.sql.functions._

import graft.sink.ParquetSink
import graft.sources.{ParquetSource, Scans}

/** S1/S3/S4 scan shapes and the S8 upsert sink. */
class SourceSinkSpec extends SparkSpecBase {
  import spark.implicits._

  test("scans: filtered, small id-set inlines, large id-set semi-joins") {
    val src = new ParquetSource(spark, "/root/testdata/sf0.001")
    assert(Scans.count(src, "orders", col("o_orderstatus") === "F") > 0)
    val small = Scans.byIds(src, "orders", "o_orderkey", Seq("1", "2", "3"))
    assert(small.count() <= 3)
    assert(small.queryExecution.executedPlan.toString.contains("PushedFilters: [In(o_orderkey"),
      "inline id-set must push down to the parquet scan")
    val manyIds = (1 to 5000).map(_.toString)
    val large = Scans.byIds(src, "orders", "o_orderkey", manyIds)
    assert(large.queryExecution.executedPlan.toString.contains("LeftSemi"))
    assert(large.count() > 0)
  }

  test("parquet sink upsert: matched keys update, new keys append") {
    val dir = java.nio.file.Files.createTempDirectory("graft-sink").toString
    val sink = new ParquetSink(dir)
    sink.overwrite("t", Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    sink.upsert("t", Seq((2L, "B"), (3L, "c")).toDF("id", "v"), Seq("id"))
    val out = spark.read.parquet(s"$dir/t").orderBy("id").collect()
    assert(out.map(r => (r.getLong(0), r.getString(1))).toSeq ===
      Seq((1L, "a"), (2L, "B"), (3L, "c")))
  }
}
