package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev harness: q20 cost decomposition — stats pass vs fingerprint pass
  * (`runMain graft.DevProfileQ20 [sfDir] [reps]`).
  */
object DevProfileQ20 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (_ <- 1 to reps) {
      t("stats-only")(docs.select(col("doc_id"), TextAnalysis.textStats(col("text")).as("st")))
      t("fp-only")(docs.select(col("doc_id"), TextAnalysis.fingerprint(col("text")).as("fp")))
      t("fp64-only")(docs.select(col("doc_id"), TextAnalysis.fingerprint64(col("text")).as("fp")))
      t("md5-only")(docs.select(col("doc_id"), md5(col("text")).as("fp")))
      t("regex-only")(docs.select(col("doc_id"),
        trim(regexp_replace(lower(col("text")), "\\s+", " ")).as("c")))
    }
    spark.stop()
  }
}
