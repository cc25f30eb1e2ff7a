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
