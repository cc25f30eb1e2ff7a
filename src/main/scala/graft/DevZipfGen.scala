package graft

import org.apache.spark.sql.functions._

/** Dev harness: synthesize a Zipfian real-text-shaped corpus
  * (`runMain graft.DevZipfGen [outDir] [vocab] [totalTokens] [numDocs]`)
  * — the VERDICT r14 next-#1 fixture: the shipped testdata has 31
  * distinct words, so its BPE vocabulary exhausts at ~188 merges and
  * merge batching can never be demonstrated at production merge counts.
  *
  * Public-knowledge construction (Zipf 1949 — rank-frequency power law
  * plus the law of abbreviation):
  *
  *   - rank i of `vocab` gets count ∝ 1/i^1.07 (the exponent measured on
  *     real text corpora), floored at 1 — a long tail of rare words;
  *   - word spellings are FIXED-WIDTH base-64 syllable codes: rank i
  *     spells as the 2-letter syllables of its base-64 digits, so (a)
  *     spelling is injective (no two ranks collide), (b) frequent words
  *     are short and rare words long (abbreviation law), and (c) words
  *     share syllable substructure the way real text shares morphemes —
  *     the merge lattice BPE actually climbs;
  *   - token occurrences scatter into `numDocs` documents by a seeded
  *     hash — deterministic, no RNG state.
  *
  * Output: `<outDir>/documents.parquet` with (doc_id, text) — the shape
  * DevBpeLadder reads. Defaults give 10×-rung row counts (50 k docs,
  * ~5 M tokens, 60 k distinct words).
  */
object DevZipfGen {

  /** 64 distinct two-letter syllables (frequent English bigrams — fixed
    * width keeps concatenation injective).
    */
  private[graft] val Syllables: Array[String] = Array(
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd", "ti", "es",
    "or", "te", "of", "ed", "is", "it", "al", "ar", "st", "to", "nt", "ng",
    "se", "ha", "as", "ou", "io", "le", "ve", "co", "me", "de", "hi", "ri",
    "ro", "ic", "ne", "ea", "ra", "ce", "li", "ch", "ll", "be", "ma", "si",
    "om", "ur", "ca", "el", "ta", "la", "ns", "di", "fo", "ho", "pe", "ec",
    "pr", "no", "ct", "us")

  /** Rank → spelling: the base-64 digits of `rank`, least significant
    * first, each a fixed-width syllable. Injective by construction.
    */
  private[graft] def word(rank: Long): String = {
    require(rank >= 1, s"ranks are 1-based; got $rank")
    val sb = new StringBuilder
    var r = rank
    while (r > 0) { sb.append(Syllables((r % 64).toInt)); r /= 64 }
    sb.toString
  }

  def main(args: Array[String]): Unit = {
    val out = if (args.length > 0) args(0) else "/tmp/zipf"
    val vocab = if (args.length > 1) args(1).toInt else 60000
    val totalTokens = if (args.length > 2) args(2).toLong else 5000000L
    val numDocs = if (args.length > 3) args(3).toInt else 50000
    val s = 1.07
    val spark = Engine.session(master = "local[32]", appName = "zipf-gen")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    val weights = (1 to vocab).map(i => 1.0 / math.pow(i.toDouble, s))
    val norm = totalTokens.toDouble / weights.sum
    val rows = weights.zipWithIndex.map { case (w, i) =>
      (i + 1L, word(i + 1L), math.max(1L, math.round(w * norm)))
    }
    val df = rows.toDF("rank", "w", "cnt").repartition(64, col("rank"))
    val docs = df
      .select(col("rank"), col("w"), explode(expr("sequence(1, cnt)")).as("j"))
      .withColumn("doc_id", pmod(xxhash64(col("rank"), col("j")), lit(numDocs.toLong)))
      // deterministic within-doc order (hash of the occurrence key), so
      // reruns produce byte-identical documents
      .groupBy(col("doc_id"))
      .agg(concat_ws(" ", expr(
        "transform(array_sort(collect_list(struct(xxhash64(w, j) AS o, w AS w))), x -> x.w)"))
        .as("text"))
    docs.coalesce(8).write.mode("overwrite").parquet(s"$out/documents.parquet")
    val stats = spark.read.parquet(s"$out/documents.parquet")
      .select(explode(graft.operators.TextAnalysis.wsTokens(col("text"))).as("w"))
      .filter(col("w") =!= "")
      .agg(count(lit(1)).as("tokens"), count_distinct(col("w")).as("distinct_words"))
      .head()
    println(s"ZIPF_GEN out=$out docs=$numDocs vocab=$vocab " +
      s"tokens=${stats.getLong(0)} distinct=${stats.getLong(1)}")
    spark.stop()
  }
}
