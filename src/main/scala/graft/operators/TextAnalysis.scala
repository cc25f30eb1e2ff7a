package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text statistics for training-data curation: token counting, quality
  * scoring, language identification, and document fingerprinting.
  * All pure column pipelines (codegen'd, no UDFs, no shuffles).
  */
object TextAnalysis {

  /** Whitespace token count (empty/null-safe). */
  def tokenCount(text: Column): Column =
    when(text.isNull || trim(text) === "", 0).otherwise(size(split(trim(text), "\\s+")))

  /** BPE-ish subword count estimate: word-boundary pieces plus an extra
    * piece per 6 chars of long words (approximates subword splitting
    * without a vocabulary).
    */
  def subwordCountEstimate(text: Column): Column = {
    val words = split(trim(text), "\\s+")
    aggregate(
      words,
      lit(0),
      (acc, w) => acc + greatest(ceil(length(w).cast("double") / 6.0).cast("int"), lit(1)))
  }

  /** Quality signals: each component is a ratio of exact integer counts, so
    * the doubles are engine-portable (single division, no reductions).
    */
  def alphaRatio(text: Column): Column =
    length(regexp_replace(text, "[^A-Za-z]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def punctRatio(text: Column): Column =
    length(regexp_replace(text, "[^.,;:!?]", "")).cast("double") /
      greatest(length(text), lit(1)).cast("double")

  def meanWordLen(text: Column): Column =
    length(regexp_replace(text, "\\s+", "")).cast("double") /
      greatest(tokenCount(text), lit(1)).cast("double")

  /** Stopword hit ratio against a fixed marker list. */
  def stopwordRatio(text: Column, stopwords: Seq[String]): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val hits = size(org.apache.spark.sql.functions.filter(
      words, w => w.isin(stopwords.map(x => x: Any): _*)))
    hits.cast("double") / greatest(size(words), lit(1)).cast("double")
  }

  /** Composite quality score in [0,1]: weighted blend of signals. Weights
    * are exact binary fractions so the arithmetic is portable.
    */
  def qualityScore(text: Column): Column =
    alphaRatio(text) * 0.5 + least(meanWordLen(text) / 8.0, lit(1.0)) * 0.25 +
      (lit(1.0) - least(punctRatio(text) * 4.0, lit(1.0))) * 0.25

  /** N-gram-heuristic language ID: score each language by marker-word hits,
    * pick the max (ties broken by fixed language order), `und` when nothing
    * matches.
    */
  val LangMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "to", "is", "a"),
    "es" -> Seq("el", "la", "de", "que", "y", "los"),
    "fr" -> Seq("le", "la", "les", "des", "est", "et"),
    "de" -> Seq("der", "die", "das", "und", "ist", "nicht"),
    "zh" -> Seq("的", "是", "了", "在", "我", "不")
  )

  def languageId(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.functions.LangIdExpr(
      GraftColumnBridge.expression(split(lower(trim(text)), "\\s+")), LangMarkers))
  }

  /** The interpreted column formulation [[languageId]] is bit-identical to —
    * kept for the equivalence spec and as the SQL-portable documentation of
    * the semantics (this is what the DuckDB oracle runs).
    */
  def languageIdColumns(text: Column): Column = {
    val words = split(lower(trim(text)), "\\s+")
    val scores = LangMarkers.map { case (lang, markers) =>
      lang -> size(org.apache.spark.sql.functions.filter(
        words, w => w.isin(markers.map(x => x: Any): _*)))
    }
    // strictly-greater comparison in fixed order = deterministic argmax
    val best = scores.tail.foldLeft((lit(scores.head._1), scores.head._2)) {
      case ((bestLang, bestScore), (lang, score)) =>
        (when(score > bestScore, lit(lang)).otherwise(bestLang),
          greatest(score, bestScore))
    }
    when(best._2 > 0, best._1).otherwise(lit("und"))
  }

  /** Stable content fingerprint: md5 of case-folded, whitespace-collapsed
    * text — the exact-dedup key that survives formatting noise.
    */
  def fingerprint(text: Column): Column =
    md5(trim(regexp_replace(lower(text), "\\s+", " ")))

  /** Gopher-style repetition signals, per document: word count, duplicate-
    * word fraction (1 − distinct/total), and the share of the document
    * covered by its single most frequent word n-gram. High values on any of
    * them mark boilerplate/spam for the curation gates.
    *
    * Shape: one explode → two-level aggregate (per-(doc, gram) counts
    * map-side combine before the doc-level max) — the q46 top-k shape, linear
    * in corpus size, no per-row quadratic work. Returns
    * (id, word_cnt, dup_word_frac, top_ngram_cnt, top_ngram_frac).
    */
  def repetitionSignals(
      docs: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      n: Int = 2): org.apache.spark.sql.DataFrame = {
    val id = col(idCol)
    val base = docs.select(id, split(trim(col(textCol)), "\\s+").as("__w"))
    val stats = base.select(
      id,
      size(col("__w")).as("word_cnt"),
      size(array_distinct(col("__w"))).as("__dc"))
    // contiguous n-grams WITH multiplicity (unlike the distinct shingles of
    // Dedup.wordShingles — frequency is the signal here); sequence() with
    // start > stop counts DOWN in Spark, so short docs short-circuit
    val grams = base.select(
      id,
      explode(
        when(size(col("__w")) >= n,
          transform(sequence(lit(1), size(col("__w")) - (n - 1)),
            i => concat_ws(" ", (0 until n).map(k => element_at(col("__w"), i + k)): _*)))
          .otherwise(array())).as("__g"))
    val top = grams
      .groupBy(id, col("__g")).agg(count(lit(1)).as("__n"))
      .groupBy(id).agg(max(col("__n")).as("top_ngram_cnt"))
    stats.join(top, Seq(idCol), "left")
      .select(
        id,
        col("word_cnt"),
        round(lit(1.0) - col("__dc").cast("double") / col("word_cnt").cast("double"), 6)
          .as("dup_word_frac"),
        coalesce(col("top_ngram_cnt"), lit(0L)).as("top_ngram_cnt"),
        round(coalesce(col("top_ngram_cnt"), lit(0L)).cast("double") * n /
          col("word_cnt").cast("double"), 6).as("top_ngram_frac"))
  }

  /** Karp-Rabin rolling hash over words (polynomial accumulate) — cheap
    * order-sensitive fingerprint for shift detection; xxhash64-based
    * (scale path, not oracle-portable). The accumulator lives in Z_2^31 and
    * tokens are masked to 32 bits so no step exceeds ~2^51: Spark 4 runs
    * ANSI mode by default, where a wrapping `acc * p + x` would throw
    * ARITHMETIC_OVERFLOW instead of wrapping.
    */
  def rollingHash(text: Column): Column =
    aggregate(
      split(trim(text), "\\s+"),
      lit(0L),
      (acc, w) =>
        pmod(acc * 1000003L + xxhash64(w).bitwiseAND(lit(0xffffffffL)), lit(1L << 31)))
}
