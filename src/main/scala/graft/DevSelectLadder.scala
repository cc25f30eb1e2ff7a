package graft

import org.apache.spark.sql.functions._

/** Dev harness: DSIR selection at production topN
  * (`runMain graft.DevSelectLadder [sfDir] [topNs]`) — the VERDICT r13
  * next #3 scale rung. For each requested topN it runs BOTH
  * [[graft.operators.Sampling.importanceSelect]] paths — the TakeOrdered
  * plan (right while partitions×topN fits one merge task) and the
  * distributed quantile-cutoff plan (takeOrderedMaxN = 0) — and prints
  * wall seconds plus a full set-identity check (EXCEPT both directions),
  * because the cutoff path's claim is "same selection, no single-task
  * merge", not "approximately the same selection".
  *
  * The interesting regime is topN in the hundreds of thousands and up:
  * DSIR's production use is "select the training budget", where
  * per-partition top-N → one merge task holding partitions×topN rows is
  * the bottleneck by construction and the rank-derived score cutoff +
  * boundary tie-break is the plan that survives.
  */
object DevSelectLadder {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf10"
    val topNs =
      if (args.length > 1) args(1).split(",").map(_.trim.toInt).toSeq
      else Seq(100000, 250000)
    val spark = Engine.session(master = "local[32]", appName = "select-ladder")
    spark.sparkContext.setLogLevel("WARN")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"), col("source"))

    for (n <- topNs) {
      def run(label: String, maxN: Int) = {
        val t0 = System.nanoTime()
        val picked = graft.operators.Sampling.importanceSelect(
          docs, "doc_id", "text", isTarget = col("source") === "src0",
          topN = n, takeOrderedMaxN = maxN)
        val cnt = picked.count()
        val sec = (System.nanoTime() - t0) / 1e9
        println(f"SELECT_LADDER topN=$n path=$label rows=$cnt sec=$sec%.1f")
        picked.select("doc_id")
      }
      val ordered = run("take_ordered", Int.MaxValue)
      val cutoff = run("cutoff", 0)
      val extraA = ordered.exceptAll(cutoff).count()
      val extraB = cutoff.exceptAll(ordered).count()
      println(s"SELECT_LADDER topN=$n identity: ordered\\cutoff=$extraA " +
        s"cutoff\\ordered=$extraB " + (if (extraA == 0 && extraB == 0) "IDENTICAL" else "DIVERGED"))
    }
    spark.stop()
  }
}
