package graft

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
      val (merges, rounds) =
        graft.operators.Bpe.learnMergesWithRounds(docs, "text", numMerges, batchK = k)
      val rows = merges.orderBy("merge_idx").collect()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"BPE_LADDER batchK=$k merges=${rows.length} rounds=$rounds sec=$sec%.1f")
      k -> rows.map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    }
    for (Seq((ka, a), (kb, b)) <- tables.combinations(2)) {
      val detail =
        if (a == b) "IDENTICAL"
        else if (a.length != b.length && a.zip(b).forall(p => p._1 == p._2))
          s"DIVERGED (length ${a.length} vs ${b.length}, common prefix equal)"
        else s"DIVERGED (first mismatch at ${a.zip(b).indexWhere(p => p._1 != p._2)})"
      println(s"BPE_LADDER identity batchK=$ka vs batchK=$kb: $detail")
    }
    spark.stop()
  }
}
