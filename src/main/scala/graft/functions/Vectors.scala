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

  /** Int8 scalar quantization: element i ↦ floor(vᵢ / scale + 0.5) with
    * scale = max|v| / 127 — the standard symmetric per-vector quantizer.
    * At 100 TB this is the ANN tier's byte lever: a float32 embedding
    * column shrinks 4× before it is shuffled, cached, or joined, and
    * COSINE NEEDS NO DEQUANTIZATION — the per-vector scales cancel in
    * dot/(‖a‖‖b‖), so [[cosineLong]] ranks quantized vectors directly.
    *
    * floor(x + 0.5) (not `round`) keeps half-way rounding engine-portable;
    * arithmetic runs in double and emits long, so every step is exact and
    * oracle-reproducible. A zero vector quantizes to zeros (scale floor).
    */
  def quantizeI8(vec: Column): Column = {
    val scale = greatest(
      aggregate(vec, lit(0.0), (acc, x) => greatest(acc, abs(x.cast("double")))),
      lit(1e-30)) / 127.0
    transform(vec, x => floor(x.cast("double") / scale + 0.5).cast("long"))
  }

  /** Cosine over integer-quantized vectors: integer products summed in
    * double (|qᵢ| ≤ 127 ⇒ every partial sum is exactly representable far
    * below 2^53, so the result is bit-identical across engines regardless
    * of SIMD/accumulation tricks — an exactness float dot products cannot
    * offer). Backed by the native [[CosineSimLong]] expression (one tight
    * loop; the interpreted HOF formulation it replaces is pinned
    * bit-identical in SimilaritySpec).
    */
  def cosineLong(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(
      CosineSimLong(GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Interpreted formulation of [[cosineLong]] — spec-pinned reference. */
  private[graft] def cosineLongHof(a: Column, b: Column): Column = {
    val dotQ = aggregate(
      zip_with(a, b, (x, y) => (x * y).cast("double")), lit(0.0), (acc, x) => acc + x)
    val na = aggregate(a, lit(0.0), (acc, x) => acc + (x * x).cast("double"))
    val nb = aggregate(b, lit(0.0), (acc, x) => acc + (x * x).cast("double"))
    when(na === 0.0 || nb === 0.0, 0.0).otherwise(dotQ / (sqrt(na) * sqrt(nb)))
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

  /** [[signBucket]] with positions wrapped modulo the vector's dimension —
    * safe when `offset + bits` may exceed it (the guard sub-key is taken
    * PAST the bucket prefix, and a short vector has no headroom there).
    * Wrapped positions land back on prefix coordinates, which are constant
    * within a bucket: the sub-key then simply splits less (degrading toward
    * the drop path), never throws, and is still similarity-preserving on
    * whatever honest headroom exists.
    */
  def signBucketWrapped(vec: Column, bits: Int, offset: Int): Column =
    concat(
      (0 until bits).map(i =>
        when(element_at(vec, pmod(lit(offset + i), greatest(size(vec), lit(1))) + 1) >= 0f,
          lit("1")).otherwise(lit("0"))): _*)
}
