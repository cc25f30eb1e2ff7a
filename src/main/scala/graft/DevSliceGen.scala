package graft

import org.apache.spark.sql.functions.col

/** Dev harness: write the trusted reference slice for the fixed-reference
  * LM gate rungs (`runMain graft.DevSliceGen <sfDir> <outPath> [source]`)
  * — the `source = src0` docs of a corpus as a standalone parquet, i.e.
  * what CCNet's Wikipedia-side training corpus is in this harness's
  * shape. One filtered scan, text column only (the model trainer needs
  * nothing else and the slice artifact should stay thin).
  */
object DevSliceGen {
  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val outPath = args(1)
    val source = if (args.length > 2) args(2) else "src0"
    val spark = Engine.session(master = "local[32]", appName = "slice-gen")
    spark.sparkContext.setLogLevel("WARN")
    spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("source") === source)
      .select(col("doc_id"), col("text"))
      .write.mode("overwrite").parquet(outPath)
    println(s"[slice-gen] wrote $outPath")
    spark.stop()
  }
}
