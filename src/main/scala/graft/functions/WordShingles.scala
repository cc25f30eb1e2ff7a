package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct word n-gram shingles of a text column — bit-identical to the
  * column formulation
  * `array_distinct(transform(sequence(1, greatest(size(w)-(n-1),1)), i -> concat_ws(' ', slice(w, i, n))))`
  * over `w = split(trim(text), "\s+")`: first-occurrence order, and a text
  * shorter than `n` words yields its single joined remainder (empty text →
  * [""], matching `split("")`).
  *
  * Native for the same reason as [[MinHashSig]]: the interpreted
  * higher-order-function pipeline costs microseconds per shingle, which
  * dominates corpus-scale dedup.
  */
case class WordShinglesExpr(child: Expression, n: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any = {
    val words = input.asInstanceOf[UTF8String].toString.trim.split("\\s+", -1)
    val limit = math.max(words.length - (n - 1), 1)
    val seen = new mutable.LinkedHashSet[String]
    var i = 0
    while (i < limit) {
      // slice semantics: up to n words starting at i, truncated at the end
      val end = math.min(i + n, words.length)
      seen.add(words.slice(i, end).mkString(" "))
      i += 1
    }
    new GenericArrayData(seen.iterator.map(UTF8String.fromString).toArray[AnyRef])
  }

  // Real codegen (LangIdExpr recipe): reference-object call on the evaluated
  // input keeps the surrounding projection in whole-stage codegen.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("wordShingles", this, classOf[WordShinglesExpr].getName)
    defineCodeGen(ctx, ev, c => s"(ArrayData) $ref.evalShingles($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def evalShingles(s: org.apache.spark.unsafe.types.UTF8String): Any = nullSafeEval(s)

  override protected def withNewChildInternal(newChild: Expression): WordShinglesExpr =
    copy(child = newChild)
}
