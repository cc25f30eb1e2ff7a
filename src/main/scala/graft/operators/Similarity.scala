package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Vectors

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Two tiers:
  *   - [[bruteForceTopK]]: exact top-k, query set broadcast against the
  *     corpus — the correctness baseline. Scales linearly in corpus size ×
  *     query count; right answer when the query set is small.
  *   - [[lshTopK]]: sign-bucket LSH — corpus is hashed once into 2^bits
  *     buckets, queries probe only their own bucket. The scale path: the
  *     corpus shuffle is one hash partition on a small key, queries never
  *     see more than a bucket. (An IVF variant would replace the sign
  *     bucket with a learned-centroid assignment; same plan shape.)
  */
object Similarity {

  private def ranked(joined: DataFrame, k: Int): DataFrame = {
    val w = Window.partitionBy(col("query_id")).orderBy(col("cos").desc, col("neighbor_id").asc)
    joined
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "rank", "neighbor_id")
  }

  /** Exact cosine top-k: `queries` must be small (it is broadcast). */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val joined = q
      .crossJoin(c)
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Vectors.cosine(col("qvec"), col("cvec")))
    ranked(joined, k)
  }

  /** IVF cell-count heuristic: √n cells. Keeps both sides of the structure
    * sub-linear in the corpus — the centroid table (cells × dim, broadcast)
    * and the expected cell population (~√n, the per-probe candidate cost) —
    * where any FIXED cell count degenerates to a linear scan of n/cells
    * candidates per probe once the corpus outgrows it.
    */
  def autoNumCentroids(corpusSize: Long, maxCentroids: Int = 65536): Int =
    math.ceil(math.sqrt(corpusSize.toDouble)).toInt.max(4).min(maxCentroids)

  /** IVF (inverted-file) approximate top-k — the learned-centroid scale
    * path: KMeans centroids partition the corpus into `numCentroids` cells;
    * each query probes only its `nProbe` nearest cells. Per query the
    * candidate set shrinks from |corpus| to ~nProbe/numCentroids of it; the
    * corpus-side cell assignment is one broadcast join + map-side top-1
    * (computed once, reusable across query batches).
    *
    * `numCentroids <= 0` derives √n cells via [[autoNumCentroids]]. KMeans
    * trains on a bounded deterministic sample (~64 vectors per cell, the
    * usual IVF training budget) — never the full corpus.
    */
  /** KMeans centroid learning shared by [[ivfTopK]] and
    * [[Dedup.semDedupAuto]]: a bounded deterministic training sample
    * (~64 vectors per cell — the usual IVF training budget, never the
    * full corpus), 5 iterations, fixed seed; returns the
    * (centroid_id, cvec) frame every assignment step consumes. One
    * definition so the training budget and determinism knobs cannot
    * drift between the ANN and the semantic-dedup tiers (the Ckpt-helper
    * lesson, ADVICE r13).
    */
  private[graft] def trainCentroids(
      corpus: DataFrame,
      vecCol: String,
      cells: Int,
      corpusSize: Long,
      seed: Long): DataFrame = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = corpus.sparkSession
    import spark.implicits._
    val all = corpus.select(col(vecCol).cast("array<double>").as("__arr"))
    val trainTarget = cells.toLong * 64
    val sampled =
      if (corpusSize <= trainTarget) all
      else all.sample(withReplacement = false, trainTarget.toDouble / corpusSize, seed)
    // DISTINCT training points, and k clamped to their count: MLlib's
    // k-means|| init dedups candidate centers, so k > distinct-points makes
    // the aggregator index past the center array (AIOOBE on replica-heavy
    // corpora — the ADVICE r14 clamp, enforced where it is cheap: the
    // sample is bounded by cells·64 rows, so the distinct+count never
    // touches corpus scale)
    val train = sampled.distinct()
      .select(array_to_vector(col("__arr")).as("features"))
      .localCheckpoint(false)
    val distinctPoints = train.count()
    // a single distinct training vector (replica-only corpus): Spark ML
    // KMeans rejects k = 1, and no clustering is needed — that one vector
    // IS the centroid (every assignment lands on it regardless)
    if (distinctPoints <= 1L)
      return sampled.limit(1)
        .select(lit(0).as("centroid_id"),
          col("__arr").cast("array<float>").as("cvec"))
    val k = math.min(cells.toLong, distinctPoints).toInt
    val model = new KMeans().setK(k).setSeed(seed).setMaxIter(5).fit(train)
    model.clusterCenters.zipWithIndex
      .map { case (c, i) => (i, c.toArray.map(_.toFloat).toSeq) }
      .toSeq.toDF("centroid_id", "cvec")
  }

  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      numCentroids: Int = 0,
      nProbe: Int = 4,
      seed: Long = 42L): DataFrame = {
    val n = corpus.select(col(idCol)).count() // footer-only parquet count
    val cells = if (numCentroids > 0) numCentroids else autoNumCentroids(n)
    val centroids = trainCentroids(corpus, vecCol, cells, n, seed)

    def assign(df: DataFrame, id: String, vec: String, topN: Int): DataFrame =
      Relational.topOnePerGroupN(
        df.crossJoin(broadcast(centroids))
          .withColumn("__cos", Vectors.cosine(col(vec), col("cvec")))
          .drop("cvec"),
        Seq(id), Seq(col("__cos").desc, col("centroid_id").asc), topN)
        .drop("__cos", "__rnk")

    val corpusCells = assign(
      corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv")), "neighbor_id", "cv", 1)
    val queryCells = assign(
      queries.select(col(idCol).as("query_id"), col(vecCol).as("qv")), "query_id", "qv", nProbe)

    val joined = broadcast(queryCells)
      .join(corpusCells, Seq("centroid_id"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Vectors.cosine(col("qv"), col("cv")))
    ranked(joined, k)
  }

  /** LSH-bucketed approximate top-k: candidates share the query's sign
    * bucket. Recall < 1 by construction; raise `signBits` for precision,
    * lower it for recall. `signBits <= 0` derives the width from the corpus
    * size ([[Dedup.autoSignBits]]) so the expected bucket population — the
    * per-query candidate cost — stays bounded as the corpus grows.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      signBits: Int = 0): DataFrame = {
    val bits =
      if (signBits > 0) signBits
      else {
        // head(1): an empty corpus skips the probe (any width joins to zero
        // candidate rows) instead of failing on head()
        val dimRow = corpus.select(size(col(vecCol)).as("d")).head(1)
        if (dimRow.isEmpty) 1
        else {
          val n = corpus.select(col(idCol)).count()
          Dedup.autoSignBits(n).min(dimRow(0).getInt(0))
        }
      }
    val q = broadcast(
      queries.select(
        col(idCol).as("query_id"),
        col(vecCol).as("qvec"),
        Vectors.signBucket(col(vecCol), bits).as("bucket")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"),
      Vectors.signBucket(col(vecCol), bits).as("bucket"))
    val joined = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Vectors.cosine(col("qvec"), col("cvec")))
    ranked(joined, k)
  }
}
