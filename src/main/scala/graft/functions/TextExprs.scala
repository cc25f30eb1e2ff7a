package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native language-ID argmax over a pre-split word array — bit-identical to
  * the column formulation (per language: `size(filter(words, w ->
  * w.isin(markers)))`, then a fixed-order strictly-greater argmax with
  * `"und"` when the best score is 0), but ONE pass over the word array
  * instead of one interpreted `filter` lambda per (language × word) — and
  * the caller's `split(lower(trim(text)))` is evaluated once (codegen'd)
  * instead of once per language (interpreted HOFs get no common-subexpression
  * elimination, the [[MinHashSig]]/[[SimHash64Expr]] pathology).
  *
  * The child is the WORD ARRAY (`split(lower(trim(text)), "\\s+")`), so
  * tokenization semantics are exactly Spark's own codegen'd split. Null
  * input yields "und" — the same answer the interpreted column chain's
  * three-valued logic reaches (null scores fail every `>` test and the
  * final `> 0` gate), so the two formulations agree on ALL inputs.
  *
  * Marker words may belong to several languages ("la" scores both es and fr,
  * "und" scores de): each word looks up a bitmask of the languages it marks.
  */
case class LangIdExpr(child: Expression, markers: Seq[(String, Seq[String])])
    extends UnaryExpression {
  require(markers.nonEmpty && markers.size <= 32, "1..32 languages")

  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val masks: java.util.HashMap[UTF8String, Integer] = {
    val m = new java.util.HashMap[UTF8String, Integer]()
    markers.zipWithIndex.foreach { case ((_, words), i) =>
      words.foreach { w =>
        val k = UTF8String.fromString(w)
        m.merge(k, Integer.valueOf(1 << i), (a, b) => Integer.valueOf(a | b))
      }
    }
    m
  }
  @transient private lazy val langs: Array[UTF8String] =
    markers.map(m => UTF8String.fromString(m._1)).toArray
  @transient lazy val und: UTF8String = UTF8String.fromString("und")

  // null word-array ⇒ "und", never null — matches the column formulation
  override def nullable: Boolean = false
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) und else score(v.asInstanceOf[ArrayData])
  }

  override protected def nullSafeEval(input: Any): Any =
    score(input.asInstanceOf[ArrayData])

  /** The argmax loop — public so generated code can call it directly. */
  def score(words: ArrayData): UTF8String = {
    val scores = new Array[Int](langs.length)
    var i = 0
    val n = words.numElements()
    while (i < n) {
      val mask = masks.get(words.getUTF8String(i))
      if (mask != null) {
        var m = mask.intValue()
        while (m != 0) {
          val j = java.lang.Integer.numberOfTrailingZeros(m)
          scores(j) += 1
          m &= m - 1
        }
      }
      i += 1
    }
    // fixed-order strictly-greater argmax == the column fold's semantics
    var best = 0
    var k = 1
    while (k < scores.length) {
      if (scores(k) > scores(best)) best = k
      k += 1
    }
    if (scores(best) > 0) langs(best) else und
  }

  // Real codegen (round-5 A/B, DevProfileLangId): the CodegenFallback path
  // re-materialized the input row per call; this emits one virtual call on
  // the already-evaluated word array and keeps the projection inside
  // whole-stage codegen. Null child folds to "und" inline.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    import org.apache.spark.sql.catalyst.expressions.codegen.Block._
    import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
    val ref = ctx.addReferenceObj("langIdExpr", this, classOf[LangIdExpr].getName)
    val c = child.genCode(ctx)
    val code =
      code"""
        ${c.code}
        UTF8String ${ev.value} = ${c.isNull} ? $ref.und() : $ref.score(${c.value});
      """
    ev.copy(code = code, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): LangIdExpr =
    copy(child = newChild)
}
