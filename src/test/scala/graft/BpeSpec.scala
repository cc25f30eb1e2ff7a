package graft

import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Distributed BPE vocabulary learning: hand-checked merges on the classic
  * fixture, greedy-fold ≡ positional-scan equivalence, exhaustion, and the
  * applied-vocabulary counts.
  */
class BpeSpec extends SparkSpecBase {
  import spark.implicits._

  test("learnMerges reproduces the hand-computed merge sequence on the Sennrich-style fixture") {
    val docs = Seq(
      (1L, "low low lower lowest"),
      (2L, "new newer newest low")).toDF("doc_id", "text")
    val out = Bpe.learnMerges(docs, "text", numMerges = 5)
      .orderBy("merge_idx").collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    // word counts: low=3 lower=1 lowest=1 new=1 newer=1 newest=1
    // 1: (l,o)  in low/lower/lowest            -> 5
    // 2: (lo,w) same words after merge 1       -> 5
    // 3: (e,w)  in new/newer/newest            -> 3
    // 4: (n,ew) same words after merge 3       -> 3
    // 5: (e,r)  lower + newer — ties at 2 after merges 1-4 are
    //    (e,r)/(e,s)/(low,e)/(new,e)/(s,t); (e,r) wins the (lhs, rhs)
    //    lexicographic break
    assert(out.toSeq === Seq(
      (1, "l", "o", 5L),
      (2, "lo", "w", 5L),
      (3, "e", "w", 3L),
      (4, "n", "ew", 3L),
      (5, "e", "r", 2L)))
  }

  /** Positional reference: scan left to right, on (a, b) match emit merged
    * and skip two — the textbook BPE rewrite the fold must equal.
    */
  private def positionalMerge(syms: Seq[String], a: String, b: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toSeq
  }

  test("mergeFold equals the positional greedy scan on randomized symbol runs") {
    val rnd = new scala.util.Random(13)
    val alphabet = Vector("a", "b", "ab", "c")
    val cases = Seq.tabulate(200) { i =>
      val syms = Vector.fill(rnd.nextInt(9) + 1)(alphabet(rnd.nextInt(alphabet.size)))
      (i.toLong, syms)
    }
    // include the overlap traps explicitly: runs of the same symbol, and a
    // pair whose merged token collides with an alphabet symbol ("a"+"b"="ab")
    val traps = Seq(
      (1000L, Vector("a", "a", "a")), (1001L, Vector("a", "a", "a", "a")),
      (1002L, Vector("a", "b", "a", "b")), (1003L, Vector("ab", "b", "a", "b")),
      (1004L, Vector("a", "b", "b")))
    val all = cases ++ traps
    for ((a, b) <- Seq(("a", "a"), ("a", "b"), ("ab", "b"), ("b", "a"))) {
      val got = all.toDF("id", "syms")
        .withColumn("m", Bpe.mergeFold(col("syms"), a, b))
        .orderBy("id").collect()
        .map(r => r.getLong(0) -> r.getSeq[String](2).toVector).toMap
      all.foreach { case (id, syms) =>
        assert(got(id) === positionalMerge(syms, a, b).toVector,
          s"pair ($a,$b) on $syms")
      }
    }
  }

  test("learnMerges stops early when the vocabulary runs out of pairs") {
    val docs = Seq((1L, "a b c a b")).toDF("doc_id", "text")
    // single-char words: no adjacent pairs exist at all
    val none = Bpe.learnMerges(docs, "text", numMerges = 3).collect()
    assert(none.isEmpty)
    // two-char words exhaust after one merge each
    val two = Seq((1L, "ab ab cd")).toDF("doc_id", "text")
    val m = Bpe.learnMerges(two, "text", numMerges = 10)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq(("a", "b", 2L), ("c", "d", 1L)))
  }

  test("subwordStats: zero merges count characters, more merges never increase subwords") {
    val docs = Seq(
      (1L, "low lower"),
      (2L, "newest")).toDF("doc_id", "text")
    val zero = Bpe.subwordStats(docs, "doc_id", "text", Seq.empty)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    assert(zero.toSeq === Seq((1L, 2L, 8L), (2L, 1L, 6L))) // chars per doc
    val merges = Bpe.learnMerges(docs, "text", numMerges = 4)
      .orderBy("merge_idx").collect()
      .map(r => (r.getString(1), r.getString(2))).toSeq
    val applied = Bpe.subwordStats(docs, "doc_id", "text", merges)
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    applied.zip(zero).foreach { case ((id, nt, ns), (_, nt0, ns0)) =>
      assert(nt === nt0)          // merges never change token counts
      assert(ns <= ns0 && ns >= nt) // compression bounded by tokens
    }
  }
}
