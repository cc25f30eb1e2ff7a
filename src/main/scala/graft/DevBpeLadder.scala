package graft

import org.apache.spark.sql.functions._

/** Dev harness: BPE merge-learning at production vocabulary scale
  * (`runMain graft.DevBpeLadder [sfDir] [numMerges] [batchKs]`) — the
  * VERDICT r13 next #1 done-criterion: a measured 10× rung at ≥1,000
  * merges showing the ROUND COUNT (one pair-count Spark job per round —
  * the driver-bound cost batching exists to cut) dropped ~k×, not
  * wall-clock noise.
  *
  * Runs [[graft.operators.Bpe.learnMergesWithRounds]] once per requested
  * batch width over the corpus' `text` column and prints one line per
  * rung: merges learned, rounds paid, wall seconds. After all rungs it
  * cross-checks the merge TABLES pairwise — the batching proof
  * (acceptablePrefix) claims batched ≡ sequential exactly, so the learned
  * (merge_idx, lhs, rhs, pair_count) sequences must be identical row for
  * row on the real corpus, not just on BpeSpec's fixtures.
  */
object DevBpeLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val numMerges = if (args.length > 1) args(1).toInt else 1024
    val batchKs =
      if (args.length > 2) args(2).split(",").map(_.trim.toInt).toSeq
      else Seq(1, graft.operators.Bpe.DefaultMergeBatch)
    val spark = Engine.session(master = "local[32]", appName = "bpe-ladder")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet").select("text")

    val tables = batchKs.map { k =>
      val t0 = System.nanoTime()
      val (merges, sizes) =
        graft.operators.Bpe.learnMergesWithBatchSizes(docs, "text", numMerges, batchK = k)
      val rows = merges.orderBy("merge_idx").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val rounds = sizes.length
      // head vs tail fill: the first/last deciles of the ROUND sequence —
      // top-of-distribution pairs share symbols (inherently serial), the
      // question is whether the Zipfian tail batches wider
      def fillOf(s: Seq[Int]) = if (s.isEmpty) 0.0 else s.sum.toDouble / s.length
      val dec = math.max(rounds / 10, 1)
      println(f"BPE_LADDER batchK=$k merges=${rows.length} rounds=$rounds " +
        f"fill=${fillOf(sizes)}%.2f headFill=${fillOf(sizes.take(dec))}%.2f " +
        f"tailFill=${fillOf(sizes.takeRight(dec))}%.2f maxBatch=${if (sizes.isEmpty) 0 else sizes.max} " +
        f"sec=$sec%.1f")
      k -> rows.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    // the adaptive LOCAL path (vocab fits the driver → the loop runs on
    // local arrays; Spark still does the one corpus-scale count): wall +
    // identity vs every distributed rung
    val tLoc = System.nanoTime()
    val localRows = graft.operators.Bpe.learnMerges(docs, "text", numMerges)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    println(f"BPE_LADDER local merges=${localRows.length} " +
      f"sec=${(System.nanoTime() - tLoc) / 1e9}%.1f")
    val tables2 = tables :+ (-1 -> localRows) // -1 = the local rung
    for (Seq((ka, a), (kb, b)) <- tables2.combinations(2)) {
      val detail =
        if (a == b) "IDENTICAL"
        else if (a.length != b.length && a.zip(b).forall(p => p._1 == p._2))
          s"DIVERGED (length ${a.length} vs ${b.length}, common prefix equal)"
        else s"DIVERGED (first mismatch at ${a.zip(b).indexWhere(p => p._1 != p._2)})"
      println(s"BPE_LADDER identity batchK=$ka vs batchK=$kb: $detail")
    }
    // optional 4th arg "encode": time the APPLICATION side at this merge
    // count — vocabulary + per-doc token-id sequences under the learned
    // table (VERDICT r14 next #1c: applyMergesChunked's checkpoint-every-48
    // discipline exercised past a handful of chunks)
    if (args.length > 3 && args(3) == "encode") {
      val merges = tables.last._2.map(r => (r._2, r._3))
      val t0 = System.nanoTime()
      val voc = graft.operators.Bpe.vocabulary(
        spark.read.parquet(s"$sfDir/documents.parquet")
          .withColumn("doc_id", monotonically_increasing_id()) // ladder corpora may lack ids
          .select(col("doc_id"), col("text")), "text", merges).count()
      val tv = (System.nanoTime() - t0) / 1e9
      val t1 = System.nanoTime()
      val enc = graft.operators.Bpe.encode(
          spark.read.parquet(s"$sfDir/documents.parquet")
            .withColumn("doc_id", monotonically_increasing_id())
            .select(col("doc_id"), col("text")), "doc_id", "text", merges)
        .agg(count(lit(1)).as("docs"), sum(col("n_ids")).as("ids"))
        .head()
      val te = (System.nanoTime() - t1) / 1e9
      println(f"BPE_LADDER encode merges=${merges.length} vocab=$voc vocabSec=$tv%.1f " +
        f"docs=${enc.getLong(0)} ids=${enc.getLong(1)} encodeSec=$te%.1f " +
        f"chunks=${math.ceil(merges.length / 48.0).toInt}")
    }
    spark.stop()
  }
}
