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

  test("batched learning ≡ sequential learning: fixtures, interacting traps, randomized corpora") {
    // the Sennrich fixture's merges interact pairwise ((l,o)→(lo,w),
    // (e,w)→(n,ew)) — batching must stop at every chain link and still
    // produce the identical table
    val fixtures = Seq(
      Seq((1L, "low low lower lowest"), (2L, "new newer newest low")),
      // heavy interaction: every top pair shares a symbol
      Seq((1L, "aa aaa aaaa ab ba"), (2L, "abab baba aabb")),
      // fully disjoint frequent pairs: one round should take several
      Seq((1L, "ab ab ab cd cd cd ef ef gh"), (2L, "ab cd ef gh ij kl")),
      // randomized
      {
        val rnd = new scala.util.Random(41)
        val alpha = "abcdefgh"
        Seq.tabulate(40) { i =>
          val words = Seq.fill(rnd.nextInt(6) + 2)(
            Seq.fill(rnd.nextInt(5) + 1)(alpha(rnd.nextInt(alpha.length))).mkString)
          (i.toLong, words.mkString(" "))
        }
      })
    for (rows <- fixtures; n <- Seq(3, 8)) {
      val docs = rows.toDF("doc_id", "text")
      // localMaxVocab = 0 forces the DISTRIBUTED path on both sides —
      // this test pins batching, not the local/distributed seam (below)
      val seqOut = Bpe.learnMerges(docs, "text", numMerges = n, batchK = 1,
          localMaxVocab = 0)
        .orderBy("merge_idx").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      val batOut = Bpe.learnMerges(docs, "text", numMerges = n, batchK = 64,
          localMaxVocab = 0)
        .orderBy("merge_idx").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(batOut === seqOut, s"batched ≠ sequential on $rows (numMerges=$n)")
      // the LOCAL loop (the default path for any vocab that fits the
      // driver) must produce the identical table: same counting, same
      // UTF-8-byte-order tie-break, same greedy fold
      val locOut = Bpe.learnMerges(docs, "text", numMerges = n)
        .orderBy("merge_idx").collect()
        .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
      assert(locOut === seqOut, s"local ≠ distributed on $rows (numMerges=$n)")
    }
  }

  test("incremental local loop ≡ per-merge recount, deep merges on randomized corpora") {
    // the incremental path (occurrence index + lazy-deletion heap) must
    // replay the recount loop's exact merge table — count, order, and
    // UTF-8 tie-breaks — including regimes where counts rise and fall
    // across merges and pairs are destroyed then re-created. Driver-side
    // only: both loops run on the same collected word array.
    val rnd = new scala.util.Random(1234)
    for (trial <- 0 until 4) {
      val alpha = if (trial % 2 == 0) "abcd" else "abcdefghij"
      val words = Array.tabulate(300 + trial * 200) { _ =>
        val w = Seq.fill(rnd.nextInt(9) + 1)(alpha(rnd.nextInt(alpha.length))).mkString
        (w.toCharArray.map(_.toString), rnd.nextInt(50).toLong + 1L)
      }
      def deepCopy() = words.map { case (s, c) => (s.clone(), c) }
      val n = 120 // deep enough to hit exhaustion on the small-alphabet trials
      val inc = Bpe.learnMergesLocalLoop(deepCopy(), n)
      val rec = Bpe.learnMergesLocalLoopRecount(deepCopy(), n)
      assert(inc === rec, s"trial $trial: incremental ≠ recount")
    }
  }

  test("batching reduces Spark rounds when top pairs are disjoint, and never past interaction") {
    // six mutually disjoint two-letter words with separated counts: one
    // round can absorb all six merges
    val disjoint = Seq((1L,
      ("ab " * 64 + "cd " * 32 + "ef " * 16 + "gh " * 8 + "ij " * 4 + "kl " * 2).trim))
      .toDF("doc_id", "text")
    val (m1, r1) = Bpe.learnMergesWithRounds(disjoint, "text", numMerges = 6, batchK = 64)
    assert(m1.count() === 6L && r1 < 6, s"expected one-ish rounds, got $r1")
    // the chain fixture ((l,o) then (lo,w)) cannot batch the chain link:
    // sequential and batched must agree (already pinned above); here pin
    // that the batch rule really fires mid-prefix — rounds > merges/64
    val chain = Seq((1L, "low low low")).toDF("doc_id", "text")
    val (m2, r2) = Bpe.learnMergesWithRounds(chain, "text", numMerges = 2, batchK = 64)
    val got = m2.orderBy("merge_idx").collect().map(r => (r.getString(1), r.getString(2)))
    assert(got.toSeq === Seq(("l", "o"), ("lo", "w")))
    assert(r2 === 2, "interacting chain must fall back to one merge per round")
  }

  test("acceptablePrefix: stops at shared symbols, merged-token collisions, and close counts") {
    // shared symbol: (a,b) then (b,c) — b shared, stop after first
    val shared = Array(("a", "b", 10L), ("b", "c", 9L), ("x", "y", 8L))
    assert(Bpe.acceptablePrefix(shared, 1000, 10).map(p => (p._1, p._2)) === Seq(("a", "b")))
    // merged-token collision: (a,b) then ("ab","z") — "ab" is the merged token
    val collide = Array(("a", "b", 10L), ("ab", "z", 9L))
    assert(Bpe.acceptablePrefix(collide, 1000, 10).map(p => (p._1, p._2)) === Seq(("a", "b")))
    // count separation: (x,a) count 9 means merging (a,b) could create
    // (x,ab) with count up to 9+0; the next candidate (c,d) at 9 is NOT
    // strictly above that bound — stop
    val close = Array(("a", "b", 10L), ("x", "a", 9L), ("c", "d", 9L))
    assert(Bpe.acceptablePrefix(close, 1000, 10).map(p => (p._1, p._2)) === Seq(("a", "b")))
    // same shape but separated: (c,d) at 12 > bound 9 — accepted; note the
    // interacting (x,a) row itself is skipped, so the batch STOPS there
    val sep = Array(("a", "b", 20L), ("c", "d", 12L), ("x", "a", 9L))
    assert(Bpe.acceptablePrefix(sep, 1000, 10).map(p => (p._1, p._2)) ===
      Seq(("a", "b"), ("c", "d")))
    // incomplete collect: with collectM = 3 the tail bound is the last
    // count (9) — an unseen (·,c)/(d,·) pair could reach 9+9=18, so (c,d)
    // at 12 is no longer separated
    assert(Bpe.acceptablePrefix(sep, 3, 10).map(p => (p._1, p._2)) === Seq(("a", "b")))
  }

  test("batchedMergeFold equals sequential mergeFold on disjoint pair sets") {
    val rnd = new scala.util.Random(7)
    val pairs = Seq(("a", "b"), ("c", "d"), ("e", "f"))
    val alphabet = Vector("a", "b", "c", "d", "e", "f", "ab", "cd")
    val cases = Seq.tabulate(150) { i =>
      (i.toLong, Vector.fill(rnd.nextInt(10) + 1)(alphabet(rnd.nextInt(alphabet.size))))
    } ++ Seq(
      (1000L, Vector("a", "b", "c", "d", "e", "f")),
      (1001L, Vector("a", "a", "b", "b")),
      (1002L, Vector("e", "a", "b", "f")), // merge then adjacent to another pair's symbol
      (1003L, Vector("c", "a", "b", "d"))) // (c, ·) and (·, d) wrap a merge
    val df = cases.toDF("id", "syms")
    val seqCol = pairs.foldLeft(col("syms")) { case (c0, (a, b)) => Bpe.mergeFold(c0, a, b) }
    val out = df
      .withColumn("bat", Bpe.batchedMergeFold(col("syms"), pairs))
      .withColumn("seq", seqCol)
      .collect()
    out.foreach { r =>
      assert(r.getSeq[String](2) === r.getSeq[String](3),
        s"batched ≠ sequential on ${r.getSeq[String](1)}")
    }
  }

  test("applyMergesChunked: checkpointed chunks equal the pure fold past the chunk boundary") {
    // 60 merges > ApplyCkptEvery (48): build a synthetic chain a+b, ab+b,
    // abb+b... — every merge interacts with the previous, exercising the
    // sequential semantics across a checkpoint cut
    val merges = (0 until 60).map(i => (if (i == 0) "a" else "a" + "b" * i, "b"))
    val vocab = Seq("a" + "b" * 70, "ba", "abab").toDF("__w")
      .withColumn("__syms",
        expr("transform(sequence(1, length(__w)), i -> substring(__w, i, 1))"))
    val chunked = Bpe.applyMergesChunked(vocab, merges)
      .orderBy("__w").collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
    // pure fold reference, no checkpoints
    val pure = merges.foldLeft(vocab) { case (d, (a, b)) =>
      d.withColumn("__syms", Bpe.mergeFold(col("__syms"), a, b))
    }.orderBy("__w").collect().map(r => r.getString(0) -> r.getSeq[String](1).toVector)
    assert(chunked.toSeq === pure.toSeq)
    // and the chain really merged: a followed by 60 b's collapses the head
    val abHead = chunked.find(_._1 == "a" + "b" * 70).get._2
    assert(abHead.head === "a" + "b" * 60)
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
