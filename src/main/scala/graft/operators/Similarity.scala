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

  /** LSH-bucketed approximate top-k: candidates share the query's sign
    * bucket. Recall < 1 by construction; raise `signBits` for precision,
    * lower it for recall.
    */
  def lshTopK(
      queries: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      k: Int,
      signBits: Int = 4): DataFrame = {
    val q = broadcast(
      queries.select(
        col(idCol).as("query_id"),
        col(vecCol).as("qvec"),
        Vectors.signBucket(col(vecCol), signBits).as("bucket")))
    val c = corpus.select(
      col(idCol).as("neighbor_id"),
      col(vecCol).as("cvec"),
      Vectors.signBucket(col(vecCol), signBits).as("bucket"))
    val joined = q
      .join(c, Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", Vectors.cosine(col("qvec"), col("cvec")))
    ranked(joined, k)
  }
}
