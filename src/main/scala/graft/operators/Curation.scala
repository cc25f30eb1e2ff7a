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

    // 1+2. exact-dedup winners and quality/language gates in ONE text pass:
    // fingerprint and both gate verdicts are computed in a single pre-shuffle
    // projection (the text is read and tokenized once), the min-id winner
    // per fingerprint comes from the salted two-stage window of
    // [[Dedup.exactSurvivors]] (a degenerate duplicate group spreads across
    // the salt instead of sorting on one task), and the gates reduce to
    // boolean-flag filters on the survivors. The groupBy + join-back
    // formulation this replaces fingerprinted both sides of a self-join and
    // moved the full text through two exchanges.
    val w1 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp"), col("__fs")).orderBy(id)
    val w2 = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__fp")).orderBy(id)
    val gatedPlan = docs
      .withColumn("__fp", TextAnalysis.fingerprint(text))
      .withColumn("__fs", pmod(xxhash64(id), lit(32L)).cast("int"))
      .withColumn("__q_ok", TextAnalysis.qualityScore(text) >= minQuality)
      .withColumn("__lang_ok",
        TextAnalysis.languageId(text).isin(languages.map(x => x: Any): _*))
      .withColumn("__rn1", row_number().over(w1))
      .filter(col("__rn1") === 1)
      .withColumn("__rn2", row_number().over(w2))
      .filter(col("__rn2") === 1 && col("__q_ok") && col("__lang_ok"))
      .drop("__fp", "__fs", "__q_ok", "__lang_ok", "__rn1", "__rn2")

    // LAZY localCheckpoint, not cache: the gated corpus feeds LSH candidate
    // generation, Jaccard verification, AND the final anti-join — the
    // checkpoint materializes once inside the first consumer's job and every
    // later consumer reads the blocks, but unlike a session cache entry it
    // is reclaimed with the plan (repeated pipeline runs cannot accumulate
    // corpus-sized cached tables that bill unrelated queries for the memory).
    val gated = gatedPlan.localCheckpoint(false)

    // 3. LSH candidates -> Jaccard-verified near-dups -> drop higher ids.
    // The corpus is shingled ONCE (lazy checkpoint): the same shingle arrays
    // feed MinHash candidate generation and both sides of the Jaccard
    // verification join, so the whole pipeline is a single action with every
    // intermediate materialized exactly once.
    val shingled = gated.select(id.as("__sid"),
      Dedup.wordShingles(text, shingleLen).as("__sh")).localCheckpoint(false)
    val candidates = Dedup.minHashLshPairsFromShingles(shingled, "__sid", "__sh",
      bands, rowsPerBand)
    val confirmed = candidates
      .join(shingled.withColumnRenamed("__sid", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
      .join(shingled.withColumnRenamed("__sid", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
      .filter(Dedup.jaccard(col("__sh1"), col("__sh2")) >= jaccardThreshold)
      .select(col("id2").as(idCol))
      .distinct()

    gated.join(confirmed, Seq(idCol), "left_anti")
  }
}
