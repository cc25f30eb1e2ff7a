package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dedup family: exact, MinHash-LSH recall on a known near-dup, SimHash
  * locality, Jaccard algebra.
  */
class DedupSpec extends SparkSpecBase {
  import spark.implicits._

  private val docA = "the quick brown fox jumps over the lazy dog again and again"
  private val docB = "the quick brown fox jumps over the lazy cat again and again" // 1-word edit
  private val docC = "completely unrelated content about spark query engines at scale"

  test("exact: groups identical fingerprints, keeps min id") {
    val df = Seq((1L, "Hello  World"), (2L, "hello world"), (3L, "different")).toDF("id", "text")
    val out = Dedup.exact(df, md5(trim(regexp_replace(lower(col("text")), "\\s+", " "))), "id")
      .orderBy("keep_id").collect()
    assert(out.map(r => (r.getLong(1), r.getLong(2))).toSeq === Seq((1L, 2L), (3L, 1L)))
  }

  test("jaccard: 1 for identical sets, 0 for disjoint, symmetric in between") {
    val df = Seq((docA, docA), (docA, docC), (docA, docB)).toDF("a", "b")
      .select(Dedup.jaccard(
        array_distinct(split(col("a"), " ")), array_distinct(split(col("b"), " "))).as("j"))
    val j = df.collect().map(_.getDouble(0))
    assert(j(0) === 1.0)
    assert(j(1) < 0.1)
    assert(j(2) > 0.7 && j(2) < 1.0)
  }

  test("minhash-lsh: near-identical docs collide, unrelated docs do not") {
    val docs = Seq((1L, docA), (2L, docB), (3L, docC)).toDF("doc_id", "text")
    val pairs = Dedup.minHashLshPairs(docs, "doc_id", "text",
      shingleLen = 2, bands = 8, rowsPerBand = 2).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)))
  }

  test("minhash signature: equal inputs give equal signatures, stable across runs") {
    val df = Seq(docA, docA).toDF("text")
      .select(Dedup.minHashSignature(Dedup.wordShingles(col("text"), 2), 8).as("sig"))
    val sigs = df.collect().map(_.getSeq[String](0))
    assert(sigs(0) === sigs(1))
    assert(sigs(0).size === 8)
  }

  test("simhash: near-dups differ in few bits, unrelated docs in many") {
    val df = Seq((docA, docB), (docA, docC)).toDF("a", "b")
      .select(Dedup.hammingBits(
        Dedup.simHashBits(col("a"), 32), Dedup.simHashBits(col("b"), 32)).as("d"))
    val d = df.collect().map(_.getInt(0))
    assert(d(0) < d(1))
    assert(d(0) <= 8)
  }

  test("simHash64 and rolling-hash hamming helpers are deterministic") {
    val df = Seq(docA, docA).toDF("text")
      .select(Dedup.simHash64(col("text")).as("h"))
    val h = df.collect().map(_.getLong(0))
    assert(h(0) === h(1))
  }

  test("charShingles produce distinct n-length grams") {
    val out = Seq("abcd").toDF("t")
      .select(Dedup.charShingles(col("t"), 2)).head().getSeq[String](0)
    assert(out === Seq("ab", "bc", "cd"))
  }
}
