package graft

import org.apache.spark.sql.functions._

/** Dev harness: A/B the q03 aggregate with vs without countDistinct
  * (`runMain graft.DevAbQ03 [sfDir] [reps]`) — VERDICT r3 asked whether the
  * countDistinct Expand explains the 0.47→0.61 s warm drift.
  */
object DevAbQ03 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "ab")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"AB $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (_ <- 1 to reps) {
      t("with-countDistinct")(
        SparkEntry.queries("q03_part_revenue")(spark, sfDir).count())
      t("without-countDistinct") {
        val withBrand = graft.operators.Relational.resolveFk(
          spark.read.parquet(s"$sfDir/lineitem.parquet"),
          spark.read.parquet(s"$sfDir/part.parquet"),
          "l_partkey", "p_partkey", "p_brand", "brand")
        graft.operators.Relational.resolveFk(
            withBrand, spark.read.parquet(s"$sfDir/supplier.parquet"),
            "l_suppkey", "s_suppkey", "s_name", "supplier_name")
          .groupBy("brand")
          .agg(
            sum((col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,6)"))
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .orderBy("brand").count()
      }
    }
    spark.stop()
  }
}
