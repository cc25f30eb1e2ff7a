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

/** Dev harness: stage-by-stage timing of [[graft.operators.Curation.pipeline]]
  * with q33's parameters (`runMain graft.DevProfileCuration [sfDir] [reps]`).
  */
object DevProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import graft.operators.{Curation, Dedup, TextAnalysis}

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      t("read")(docs.count())
      val surv = Dedup.exactSurvivors(docs, TextAnalysis.fingerprint(col("text")), "doc_id")
      t("exactSurvivors")(surv.count())
      val gated = surv.filter(TextAnalysis.qualityScore(col("text")) >= 0.3 &&
        TextAnalysis.languageId(col("text")).isin("en", "es", "fr", "de", "zh"))
      t("gated")(gated.count())
      val shingled = gated.select(col("doc_id").as("__sid"),
        Dedup.wordShingles(col("text"), 2).as("__sh")).localCheckpoint(false)
      val candidates = Dedup.minHashLshPairsFromShingles(shingled, "__sid", "__sh", 4, 3)
      t("candidates")(candidates.count())
      val confirmed = candidates
        .join(shingled.withColumnRenamed("__sid", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
        .join(shingled.withColumnRenamed("__sid", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
        .filter(Dedup.jaccard(col("__sh1"), col("__sh2")) >= 0.6)
        .select(col("id2").as("doc_id")).distinct()
      t("confirmed")(confirmed.count())
      t("full-pipeline")(Curation.pipeline(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
