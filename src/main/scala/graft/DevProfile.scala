package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev harness: stage-by-stage timing of the MinHash-LSH pipeline. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    val shingles = Dedup.wordShingles(col("text"), 2)
    t("shingles")(docs.select(col("doc_id"), shingles.as("s")).agg(sum(size(col("s")))).head().getLong(0))
    val sig = Dedup.minHashSignature(shingles, 16)
    t("signature")(docs.select(col("doc_id"), sig.as("g")).agg(sum(size(col("g")))).head().getLong(0))
    val bandsCol = Dedup.lshBands(sig, 4, 2)
    t("bands")(docs.select(col("doc_id"), bandsCol.as("b")).agg(sum(size(col("b")))).head().getLong(0))
    val banded = docs.select(col("doc_id").as("doc"), posexplode(bandsCol)).toDF("doc", "band", "bucket")
    t("banded")(banded.count())
    val a = banded.toDF("id1", "band", "bucket")
    val b = banded.toDF("id2", "band", "bucket")
    t("rawjoin")(a.join(b, Seq("band", "bucket")).filter(col("id1") < col("id2")).count())
    t("full")(Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 4, 2).count())
    spark.stop()
  }
}
