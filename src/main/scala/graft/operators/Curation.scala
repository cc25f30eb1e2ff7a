package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The composed training-data curation pipeline — the end-to-end shape the
  * individual operators exist for:
  *
  *   1. exact dedup: keep the min-id document per content fingerprint;
  *   2. heuristic quality + language gates ([[TextAnalysis]]);
  *   3. near-dup removal: MinHash-LSH candidates ([[Dedup.minHashLshPairs]])
  *      verified by shingle Jaccard, dropping the higher id of each
  *      confirmed pair (survivorship matches exact dedup's min-id rule).
  *
  * Scale shape: stage 1 is one hash-shuffle on the fingerprint; stage 2 is
  * map-only; stage 3's only shuffle is the LSH band join — candidates, not
  * the corpus, pay the pairwise Jaccard cost.
  */
object Curation {

  def pipeline(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      minQuality: Double = 0.3,
      languages: Seq[String] = Seq("en", "es", "fr", "de", "zh"),
      shingleLen: Int = 2,
      bands: Int = 4,
      rowsPerBand: Int = 3, // s-curve threshold (1/b)^(1/r) ≈ 0.63 ≈ the verify bar
      jaccardThreshold: Double = 0.6): DataFrame = {
    val id = col(idCol)
    val text = col(textCol)

    // 1. exact dedup winners
    val withFp = docs.withColumn("__fp", TextAnalysis.fingerprint(text))
    val winners = withFp.groupBy(col("__fp")).agg(min(id).as(idCol))
    val exactKept = withFp.join(winners, Seq("__fp", idCol)).drop("__fp")

    // 2. quality + language gates (map-only). Cached: the gated corpus
    // feeds LSH candidate generation, Jaccard verification, and the final
    // anti-join — and the gate expressions are interpreted HOFs that should
    // run once per document, not once per consumer.
    val gated = exactKept
      .filter(TextAnalysis.qualityScore(text) >= minQuality)
      .filter(TextAnalysis.languageId(text).isin(languages.map(x => x: Any): _*))
      .cache()

    // 3. LSH candidates -> Jaccard-verified near-dups -> drop higher ids
    val candidates = Dedup.minHashLshPairs(gated, idCol, textCol,
      shingleLen, bands, rowsPerBand)
    val shingled = gated.select(id.as("__sid"),
      Dedup.wordShingles(text, shingleLen).as("__sh")).cache()
    val confirmed = candidates
      .join(shingled.withColumnRenamed("__sid", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
      .join(shingled.withColumnRenamed("__sid", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
      .filter(Dedup.jaccard(col("__sh1"), col("__sh2")) >= jaccardThreshold)
      .select(col("id2").as(idCol))
      .distinct()

    gated.join(confirmed, Seq(idCol), "left_anti")
  }
}
