package graft

import org.apache.spark.sql.functions._

import graft.operators.TextAnalysis

/** Dev harness: per-signal timing of the q20 text-stats columns
  * (`runMain graft.DevProfileQ20 [sfDir]`).
  */
object DevProfileQ20 {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "profq20")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val t0c = col("text")

    def t(label: String, c: org.apache.spark.sql.Column): Unit = {
      val df = docs.select(col("doc_id"), c.as("v"))
      df.queryExecution.toRdd.count() // warm
      val t0 = System.nanoTime()
      df.queryExecution.toRdd.count()
      println(f"PROF $label sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    t("tokenCount", TextAnalysis.tokenCount(t0c))
    t("subwordEstimate", TextAnalysis.subwordCountEstimate(t0c))
    t("alphaRatio", TextAnalysis.alphaRatio(t0c))
    t("punctRatio", TextAnalysis.punctRatio(t0c))
    t("meanWordLen", TextAnalysis.meanWordLen(t0c))
    t("quality", TextAnalysis.qualityScore(t0c))
    t("langId", TextAnalysis.languageId(t0c))
    t("fingerprint", TextAnalysis.fingerprint(t0c))
    spark.stop()
  }
}
