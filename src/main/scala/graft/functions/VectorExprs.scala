package graft.functions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, DoubleType}

/** Native cosine similarity over two `array<float>` columns.
  *
  * Bit-identical to the higher-order-function formulation in [[Vectors]]
  * (sequential double accumulation in index order: dot = Σ aᵢ·bᵢ, then
  * dot / (√Σaᵢ² · √Σbᵢ²)) — so external SQL oracles reproduce it — but a
  * single tight loop instead of three interpreted lambda pipelines, which
  * cost ~9µs per vector pair and dominated the ANN bench queries.
  */
case class CosineSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      i += 1
    }
    // norms over the FULL arrays, separately accumulated — matching the
    // column formulation where norm(a) folds over a alone
    i = 0
    val xn = x.numElements()
    while (i < xn) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
    i = 0
    val yn = y.numElements()
    while (i < yn) { val v = y.getFloat(i).toDouble; ny += v * v; i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  // Real codegen (LangIdExpr recipe): the double return is primitive, so the
  // generated assignment stays unboxed inside whole-stage codegen.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosineSim", this, classOf[CosineSim].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.evalCos($a, $b)")
  }

  /** Codegen entry point (primitive return for the generated assignment). */
  def evalCos(a: ArrayData, b: ArrayData): Double =
    nullSafeEval(a, b).asInstanceOf[Double]

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSim =
    copy(left = newLeft, right = newRight)
}

/** Native cosine over two `array<long>` (int8-quantized) vectors —
  * bit-identical to [[Vectors.cosineLong]]'s column formulation (integer
  * products accumulated one-by-one in double; |qᵢ| ≤ 127 keeps every partial
  * sum exactly representable, so accumulation order cannot matter), zero
  * when either norm is zero. One tight loop instead of three interpreted
  * lambda pipelines.
  */
case class CosineSimLong(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim_long"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var i = 0
    while (i < n) {
      dot += (x.getLong(i) * y.getLong(i)).toDouble
      i += 1
    }
    var nx = 0.0
    i = 0
    val xn = x.numElements()
    while (i < xn) { val v = x.getLong(i); nx += (v * v).toDouble; i += 1 }
    var ny = 0.0
    i = 0
    val yn = y.numElements()
    while (i < yn) { val v = y.getLong(i); ny += (v * v).toDouble; i += 1 }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosineSimLong", this, classOf[CosineSimLong].getName)
    defineCodeGen(ctx, ev, (a, b) => s"$ref.evalCos($a, $b)")
  }

  /** Codegen entry point (primitive return for the generated assignment). */
  def evalCos(a: ArrayData, b: ArrayData): Double =
    nullSafeEval(a, b).asInstanceOf[Double]

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineSimLong =
    copy(left = newLeft, right = newRight)
}

/** Shared eval helpers for the argmax expressions — each a literal mirror
  * of the Spark SQL operator it replaces, so the native expressions stay
  * bit-identical to the spec-pinned HOF formulations.
  */
private[functions] object VecOps {

  /** [[CosineSim]]'s arithmetic (same accumulation order). */
  def cos(x: ArrayData, y: ArrayData): Double = {
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var nx = 0.0
    var ny = 0.0
    var i = 0
    while (i < n) { dot += x.getFloat(i).toDouble * y.getFloat(i).toDouble; i += 1 }
    i = 0
    val xn = x.numElements()
    while (i < xn) { val v = x.getFloat(i).toDouble; nx += v * v; i += 1 }
    i = 0
    val yn = y.numElements()
    while (i < yn) { val v = y.getFloat(i).toDouble; ny += v * v; i += 1 }
    dot / (math.sqrt(nx) * math.sqrt(ny))
  }

  /** Spark `round(x, 6)` on DoubleType: NaN/Inf pass through, otherwise
    * the shortest-decimal BigDecimal HALF_UP — Catalyst RoundBase's exact
    * recipe.
    */
  def round6(d: Double): Double =
    if (d.isNaN || d.isInfinite) d
    else java.math.BigDecimal.valueOf(d)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** Spark's double total order (NaN equal to itself, greater than
    * everything) — what comparison operators, greatest, and array_max use.
    */
  @inline def cmp(a: Double, b: Double): Int = java.lang.Double.compare(a, b)
}

/** Native nearest-centroid argmax over a broadcast candidate array —
  * `array_max(transform(cands, c -> struct(round(cos(vec, c.cvec), 6),
  * -c.centroid_id, c.centroid_id)))` as ONE tight loop: no per-candidate
  * struct allocation, no interpreted lambda machinery (measured ~3 µs per
  * candidate of pure HOF overhead at 200 k × 448 — 30× the cosine
  * arithmetic itself). Ties at equal 6-dp cosine break to the LOWER
  * centroid_id; NaN cosines (zero vectors) rank greatest, exactly
  * Spark's double total order. Returns struct(cosc, centroid_id); null
  * on an empty candidate array (array_max's contract).
  *
  * left = array<float> vector; right = array<struct<centroid_id:int,
  * cvec:array<float>>>.
  */
case class CosineArgMax(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{DoubleType => DT, IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cosc", DT, nullable = false),
    StructField("centroid_id", IntegerType, nullable = false)))
  // an empty candidate array yields null even when both children are
  // non-nullable (array_max's contract)
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_arg_max"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val cands = b.asInstanceOf[ArrayData]
    val n = cands.numElements()
    if (n == 0) return null
    var bestC = 0.0
    var bestId = 0
    var first = true
    var i = 0
    while (i < n) {
      val row = cands.getStruct(i, 2)
      val id = row.getInt(0)
      val c = VecOps.round6(VecOps.cos(vec, row.getArray(1)))
      val d = if (first) 1 else VecOps.cmp(c, bestC)
      if (d > 0 || (d == 0 && id < bestId)) { bestC = c; bestId = id }
      first = false
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, bestId))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosineArgMax", this, classOf[CosineArgMax].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $ref.evalArgMax($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (InternalRow) r; }""")
  }

  /** Codegen entry point. */
  def evalArgMax(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineArgMax =
    copy(left = newLeft, right = newRight)
}

/** All intra-cell pairs above a cosine threshold, emitted from ONE
  * collected cell — the SemDeDup pair stage without the candidate
  * shuffle: the plain formulation self-joins thin (id, cell) rows and
  * then JOINS THE VECTORS BACK onto every candidate pair (two shuffles
  * probing a pairs-quadratic table; measured 102 s of a 165 s 100×
  * semDedupAuto run), where this evaluates the same O(cell²) cosines in
  * one pass over the grouped cell and emits only the passing pairs.
  * Exactly the plain join's semantics: id1 < id2, cosine > threshold
  * under SPARK's double order (`VecOps.cmp` — NaN compares greatest, so
  * a degenerate zero-vector pair's NaN cosine PASSES, exactly as the
  * join path's `filter(col("cos") > threshold)` does; ADVICE r15 —
  * Java's primitive `>` would silently drop those pairs and break the
  * path identity), the same [[CosineSim]] arithmetic (symmetric in fp —
  * the dot and both norms accumulate identically under argument swap).
  *
  * Emits struct<id1s:array<long>, id2s:array<long>> — two PRIMITIVE
  * long arrays ([[UnsafeArrayData.fromPrimitiveArray]], 16 B per pair)
  * rather than per-pair struct rows (~100-130 B of GenericInternalRow +
  * boxed Longs each; ADVICE r15 sized the all-pass worst case at a cap-
  * sized cell in the GB range). The caller bounds cell size, so the
  * worst-case emission at cap c is c²/2 pairs × 16 B (c = 2048 → 34 MB).
  *
  * left = array<struct<id:long, vec:array<float>>>; right = the
  * threshold (double).
  */
case class CosinePairsAbove(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("id1s", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("id2s", ArrayType(LongType, containsNull = false), nullable = false)))
  override def prettyName: String = "cosine_pairs_above"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val cell = a.asInstanceOf[ArrayData]
    val th = b.asInstanceOf[Double]
    val n = cell.numElements()
    val ids = new Array[Long](n)
    val vecs = new Array[ArrayData](n)
    var i = 0
    while (i < n) {
      val row = cell.getStruct(i, 2)
      ids(i) = row.getLong(0)
      vecs(i) = row.getArray(1)
      i += 1
    }
    // primitive builders: no boxing, backing arrays grow by doubling
    val lo = scala.collection.mutable.ArrayBuilder.make[Long]
    val hi = scala.collection.mutable.ArrayBuilder.make[Long]
    i = 0
    while (i < n) {
      var j = i + 1
      while (j < n) {
        if (VecOps.cmp(VecOps.cos(vecs(i), vecs(j)), th) > 0) {
          val a = ids(i); val b = ids(j)
          if (a <= b) { lo += a; hi += b } else { lo += b; hi += a }
        }
        j += 1
      }
      i += 1
    }
    import org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](
        UnsafeArrayData.fromPrimitiveArray(lo.result()),
        UnsafeArrayData.fromPrimitiveArray(hi.result())))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("cosinePairsAbove", this, classOf[CosinePairsAbove].getName)
    defineCodeGen(ctx, ev, (a, b) => s"(InternalRow) $ref.evalPairs($a, $b)")
  }

  /** Codegen entry point. */
  def evalPairs(a: ArrayData, b: Double): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosinePairsAbove =
    copy(left = newLeft, right = newRight)
}

/** [[CosineArgMax]] with the two-level triangle-inequality pruning of
  * [[graft.operators.Dedup.semAssignPruned]] fused into the same tight
  * loop — a literal mirror of the spec-pinned HOF chain (same operation
  * order: dg = sqrt(greatest(2 − 2·cos, 0)), ub = 1 − max(dg − r, 0)²/2,
  * lb = 1 − (dg + rmin)²/2, prune groups with ub < max(lb) − 1e-6, argmax
  * over surviving children), with Spark's NaN-greatest double order
  * everywhere, so degenerate vectors disable pruning exactly as the HOF
  * form does.
  *
  * left = array<float> vector; right = array<struct<gvec:array<float>,
  * r:double, rmin:double, children:array<struct<centroid_id:int,
  * cvec:array<float>>>>>.
  */
case class CosineArgMaxTwoLevel(left: Expression, right: Expression)
    extends BinaryExpression {
  import org.apache.spark.sql.types.{DoubleType => DT, IntegerType, StructField, StructType}

  override def dataType: DataType = StructType(Seq(
    StructField("cosc", DT, nullable = false),
    StructField("centroid_id", IntegerType, nullable = false)))
  // empty groups / empty children yield null even when both children are
  // non-nullable
  override def nullable: Boolean = true
  override def prettyName: String = "cosine_arg_max_two_level"

  override protected def nullSafeEval(a: Any, b: Any): Any = {
    val vec = a.asInstanceOf[ArrayData]
    val groups = b.asInstanceOf[ArrayData]
    val g = groups.numElements()
    if (g == 0) return null
    // pass 1: per-group bounds (Spark `greatest` = NaN-greatest max)
    def gmax(x: Double, y: Double): Double = if (VecOps.cmp(x, y) >= 0) x else y
    val ubs = new Array[Double](g)
    var bestLb = Double.NegativeInfinity
    var firstLb = true
    var i = 0
    while (i < g) {
      val grp = groups.getStruct(i, 4)
      val dg = math.sqrt(gmax(2.0 - 2.0 * VecOps.cos(vec, grp.getArray(0)), 0.0))
      val ub = 1.0 - math.pow(gmax(dg - grp.getDouble(1), 0.0), 2) / 2
      val lb0 = 1.0 - math.pow(dg + grp.getDouble(2), 2) / 2
      // a NaN lb (degenerate zero SUPER-vector: 0/0 cosine) claims
      // nothing about achievable cosines — but NaN is the ordering
      // MAXIMUM, so without this floor it would poison the cut and prune
      // every finite-ub group (silently wrong argmax). −∞ is the
      // conservative truth; the group's own NaN ub still keeps it
      // scanned. Mirrors the HOF form's nanvl.
      val lb = if (lb0.isNaN) Double.NegativeInfinity else lb0
      ubs(i) = ub
      if (firstLb || VecOps.cmp(lb, bestLb) > 0) { bestLb = lb; firstLb = false }
      i += 1
    }
    val cut = bestLb - 1e-6
    // pass 2: argmax over surviving groups' children
    var bestC = 0.0
    var bestId = 0
    var first = true
    i = 0
    while (i < g) {
      if (VecOps.cmp(ubs(i), cut) >= 0) {
        val children = groups.getStruct(i, 4).getArray(3)
        val n = children.numElements()
        var j = 0
        while (j < n) {
          val row = children.getStruct(j, 2)
          val id = row.getInt(0)
          val c = VecOps.round6(VecOps.cos(vec, row.getArray(1)))
          val d = if (first) 1 else VecOps.cmp(c, bestC)
          if (d > 0 || (d == 0 && id < bestId)) { bestC = c; bestId = id }
          first = false
          j += 1
        }
      }
      i += 1
    }
    if (first) null
    else new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](bestC, bestId))
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj(
      "cosineArgMaxTwoLevel", this, classOf[CosineArgMaxTwoLevel].getName)
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      Object r = $ref.evalArgMax($a, $b);
      if (r == null) { ${ev.isNull} = true; } else { ${ev.value} = (InternalRow) r; }""")
  }

  /** Codegen entry point. */
  def evalArgMax(a: ArrayData, b: ArrayData): Any = nullSafeEval(a, b)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): CosineArgMaxTwoLevel =
    copy(left = newLeft, right = newRight)
}
