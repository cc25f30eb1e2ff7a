package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

/** Distributed byte-pair-encoding vocabulary learning (Sennrich et al.
  * 2016 — the merge-table trainer behind BPE/GPT-2-style tokenizers),
  * re-expressed for Spark's execution model.
  *
  * The classic algorithm is inherently iterative — count adjacent symbol
  * pairs, merge the most frequent, repeat — and the distributed shape
  * follows from one observation: after the FIRST aggregation the working
  * set is the WORD-COUNT table (distinct words × counts), which is orders
  * of magnitude smaller than the corpus (a 100 TB crawl has ~10⁸ distinct
  * words). So:
  *
  *   - ONE corpus-scale shuffle (word counts), ever;
  *   - each merge iteration runs on the vocab table: a map-side pair
  *     explode, a (left, right) hash aggregate, and `orderBy(...).limit(1)`
  *     — Spark's distributed TakeOrdered, never a global sort — to pick
  *     the argmax pair (ties break lexicographically, pinned in both
  *     engines);
  *   - the merge rewrite is a map-only fold over each word's symbol array
  *     (greedy non-overlapping left-to-right, the BPE contract);
  *   - per-iteration `localCheckpoint` cuts the growing interpreted-HOF
  *     lineage exactly as the connected-components loop does.
  *
  * The one driver-side collect is the argmax pair itself — one row per
  * iteration, which is the output of the operator; everything else stays
  * distributed.
  *
  * Greedy-merge equivalence note (spec-pinned against a positional
  * reference): the fold emits each symbol unless the previously-emitted
  * symbol equals `left` and the current equals `right`, in which case the
  * previous symbol is REPLACED by the merged token. This is exactly the
  * positional "scan left to right, skip two on match" rule because a
  * just-merged token (`left` + `right`) can never itself equal `left`
  * (it is strictly longer), so a replacement can never enable a spurious
  * second merge at the same position.
  */
object Bpe {

  /** Learn `numMerges` BPE merges from the corpus; returns the merge table
    * (merge_idx, lhs, rhs, pair_count) in learning order. Stops early if
    * the vocabulary runs out of adjacent pairs (every word fully merged
    * or single-symbol); the output then has fewer than `numMerges` rows.
    */
  def learnMerges(
      docs: DataFrame,
      textCol: String,
      numMerges: Int): DataFrame = {
    require(numMerges > 0, s"numMerges must be positive; got $numMerges")
    val spark = docs.sparkSession
    def ckptRdd(df: DataFrame): Option[org.apache.spark.rdd.RDD[_]] =
      df.queryExecution.logical.collectFirst {
        case lr: org.apache.spark.sql.execution.LogicalRDD => lr.rdd
      }
    val wc = docs
      .select(explode(TextAnalysis.wsTokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
      .groupBy(col("__w")).agg(count(lit(1)).as("__cnt"))
    // loop state is (cnt, syms) ONLY: the word string is dead weight once
    // the symbol array exists, and it would otherwise ride every
    // checkpointed iteration copy. (This is also why subwordStats
    // re-derives word -> syms at application time instead of reusing this
    // loop's final state: the re-derivation is a vocab-scale fold —
    // negligible next to the corpus-scale join it feeds — while carrying
    // the words here would double every iteration's checkpoint bytes.)
    var state = wc
      .withColumn("__syms",
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"))
      .select(col("__cnt"), col("__syms"))
      .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    var i = 1
    while (i <= numMerges && !exhausted) {
      val top = state
        .select(col("__cnt"), explode(expr(
          """zip_with(slice(__syms, 1, greatest(size(__syms) - 1, 0)),
            |         slice(__syms, 2, greatest(size(__syms) - 1, 0)),
            |         (a, b) -> struct(a AS a, b AS b))""".stripMargin)).as("__p"))
        .groupBy(col("__p.a").as("__a"), col("__p.b").as("__b"))
        .agg(sum(col("__cnt")).as("__c"))
        .orderBy(col("__c").desc, col("__a").asc, col("__b").asc)
        .limit(1)
        .collect()
      if (top.isEmpty) exhausted = true
      else {
        val (a, b, c) = (top(0).getString(0), top(0).getString(1), top(0).getLong(2))
        merges += ((i, a, b, c))
        val next = state
          .withColumn("__syms", mergeFold(col("__syms"), a, b))
          .localCheckpoint(true, StorageLevel.MEMORY_AND_DISK_SER)
        // `next` is materialized (eager): free the superseded snapshot so
        // only ONE vocab copy stays resident regardless of numMerges (the
        // connectedComponents discipline — without this, thousands of
        // merges pin thousands of vocab-table copies)
        ckptRdd(state).foreach(_.unpersist(blocking = false))
        state = next
        i += 1
      }
    }
    ckptRdd(state).foreach(_.unpersist(blocking = false))
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "lhs", "rhs", "pair_count")
  }

  /** Greedy non-overlapping left-to-right merge of the pair (a, b) in a
    * symbol array, as a fold. `a`/`b` enter as BOUND literals (lit), never
    * spliced into SQL text — corpus-derived tokens can contain anything.
    * `try_element_at` (not `element_at`): ANSI mode throws on index -1 of
    * an empty array, and the size guard is not a short-circuit in
    * vectorized evaluation.
    */
  private[graft] def mergeFold(syms: Column, a: String, b: String): Column =
    aggregate(
      syms,
      expr("CAST(array() AS ARRAY<STRING>)"),
      (acc, s) =>
        when(
          size(acc) > 0 &&
            try_element_at(acc, lit(-1)) === lit(a) && s === lit(b),
          concat(slice(acc, lit(1), size(acc) - 1), array(lit(a + b))))
          .otherwise(concat(acc, array(s))))

  /** Retokenize: apply a learned merge table to the corpus and report per
    * doc (n_tokens, n_subwords) — the compression the vocabulary buys, the
    * number a tokenizer-sizing pass reports.
    *
    * The merges fold over the DISTINCT-WORD table, never over token
    * occurrences: a word's subword count is a function of the word alone,
    * so folding per occurrence would re-run the interpreted merge lambdas
    * corpus/vocab times for the same answer (measured 44 s → ~7 s at 10×
    * when this was rewritten). The per-word subword counts then join back
    * onto the exploded tokens — the vocab side is small enough for AQE to
    * broadcast at any corpus where it isn't, the join is an honest
    * word-keyed shuffle.
    */
  def subwordStats(
      docs: DataFrame,
      idCol: String,
      textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    val toks = docs
      .select(col(idCol), explode(TextAnalysis.wsTokens(col(textCol))).as("__w"))
      .filter(col("__w") =!= "")
    val vocab = toks.select(col("__w")).distinct()
      .withColumn("__syms",
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"))
    val merged = merges.foldLeft(vocab) { case (df, (a, b)) =>
      df.withColumn("__syms", mergeFold(col("__syms"), a, b))
    }
    toks
      .join(merged.select(col("__w"), size(col("__syms")).as("__ns")), Seq("__w"))
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__ns").cast("long")).as("n_subwords"))
  }
}
