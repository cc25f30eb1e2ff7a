package graft

import org.apache.spark.sql.functions._

import graft.functions.Vectors
import graft.operators.Similarity

/** ANN search: brute-force exactness on constructed vectors with known
  * cosine order; LSH variant returns a subset restricted to the bucket.
  */
class SimilaritySpec extends SparkSpecBase {
  import spark.implicits._

  // vec 1 is closest to the x-axis query, then 2, then 3; 4 points away.
  private val vecs = Seq(
    (0L, Seq(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Seq(0.9f, 0.1f, 0.0f, 0.0f)),
    (2L, Seq(0.7f, 0.7f, 0.0f, 0.0f)),
    (3L, Seq(0.1f, 0.9f, 0.2f, 0.0f)),
    (4L, Seq(-1.0f, -0.1f, 0.0f, 0.0f)))

  test("cosine column math matches hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, 3.0f), Seq(4.0f, 5.0f, 6.0f))).toDF("a", "b")
      .select(Vectors.dot(col("a"), col("b")).as("d"),
        Vectors.norm(col("a")).as("n"),
        Vectors.cosine(col("a"), col("b")).as("c"))
    val r = df.head()
    assert(r.getDouble(0) === 32.0)
    assert(math.abs(r.getDouble(1) - math.sqrt(14.0)) < 1e-12)
    assert(math.abs(r.getDouble(2) - 32.0 / (math.sqrt(14.0) * math.sqrt(77.0))) < 1e-12)
  }

  test("bruteForceTopK returns exact neighbor order") {
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.bruteForceTopK(queries, corpus, "vec_id", "embedding", 3)
      .orderBy("rank").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L, 3L))
  }

  test("lshTopK only surfaces same-bucket candidates") {
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 5, signBits = 1)
      .collect().map(_.getLong(2)).toSet
    // bucket = sign of first coordinate: vec 4 (negative) must be excluded
    assert(!out.contains(4L))
    assert(out.contains(1L))
  }

  test("ivfTopK: centroid-probed search finds the true near neighbors") {
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.ivfTopK(queries, corpus, "vec_id", "embedding",
        k = 2, numCentroids = 2, nProbe = 1)
      .orderBy("rank").collect()
    // probing the query's own cell must surface the nearest x-axis vectors
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 2L))
  }

  test("auto defaults scale structure size with the corpus") {
    // √n cells, bounded at both ends
    assert(Similarity.autoNumCentroids(100) === 10)
    assert(Similarity.autoNumCentroids(1000000) === 1000)
    assert(Similarity.autoNumCentroids(1) === 4)                 // floor
    assert(Similarity.autoNumCentroids(Long.MaxValue) === 65536) // cap
    assert(Similarity.autoNumCentroids(100) < Similarity.autoNumCentroids(10000))
    // lshTopK with derived bits still finds the same-direction neighbor
    val corpus = vecs.toDF("vec_id", "embedding")
    val queries = corpus.filter(col("vec_id") === 0L)
    val out = Similarity.lshTopK(queries, corpus, "vec_id", "embedding", 5)
      .collect().map(_.getLong(2)).toSet
    assert(out.contains(1L))
    assert(!out.contains(4L))
  }

  test("int8 quantization: bounded values, cosine ranking survives") {
    def vec(seed: Int) = (0 until 32).map(i =>
      math.sin(seed * 13.7 + i * 0.61).toFloat * (1 + seed % 3)).toArray
    val emb = (0L until 50L).map(i => (i, vec(i.toInt))).toDF("vec_id", "embedding")
    // every quantized component is within the int8 envelope
    val maxAbs = emb.select(Vectors.quantizeI8(col("embedding")).as("q"))
      .select(explode(col("q")).as("x")).agg(max(abs(col("x")))).head().getLong(0)
    assert(maxAbs <= 127L)
    // quantized cosine tracks exact cosine: self-similarity 1, and the exact
    // nearest neighbor of each query stays in the quantized top-3
    val q = emb.select(col("vec_id").as("qid"), col("embedding").as("qa"),
      Vectors.quantizeI8(col("embedding")).as("iq"))
    val joined = q.crossJoin(emb.select(col("vec_id").as("nid"),
        col("embedding").as("qb"), Vectors.quantizeI8(col("embedding")).as("ib")))
      .filter(col("qid") =!= col("nid"))
      .select(col("qid"), col("nid"),
        Vectors.cosine(col("qa"), col("qb")).as("exact"),
        Vectors.cosineLong(col("iq"), col("ib")).as("quant"))
      .collect()
    val exactBest = joined.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.maxBy(_.getDouble(2)).getLong(1) }
    val quantTop3 = joined.groupBy(_.getLong(0)).map { case (k, rs) =>
      k -> rs.sortBy(-_.getDouble(3)).take(3).map(_.getLong(1)).toSet }
    val hit = exactBest.count { case (k, best) => quantTop3(k).contains(best) }
    assert(hit >= 45, s"quantized top-3 recall of the exact-1NN too low: $hit/50")
    // native integer cosine ≡ the interpreted HOF formulation, bit-for-bit
    val eq = q.crossJoin(emb.select(col("vec_id").as("nid"),
        Vectors.quantizeI8(col("embedding")).as("ib")))
      .select(Vectors.cosineLong(col("iq"), col("ib")).as("native"),
        Vectors.cosineLongHof(col("iq"), col("ib")).as("hof"))
      .filter(col("native") =!= col("hof")).count()
    assert(eq === 0L)
  }

  test("signBucket groups by leading coordinate signs") {
    val df = Seq(Seq(1.0f, -2.0f, 3.0f), Seq(2.0f, -1.0f, 9.0f), Seq(-1.0f, 2.0f, 3.0f))
      .toDF("v").select(Vectors.signBucket(col("v"), 2).as("b"))
    val b = df.collect().map(_.getString(0))
    assert(b(0) === b(1))
    assert(b(0) !== b(2))
  }
}
