package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native SimHash bit-string over whitespace tokens — bit-identical to the
  * column formulation (per bit j: majority vote over tokens of the high bit
  * of hex nibble j of md5(token)), but ONE md5 per token instead of one
  * md5-and-substr per (token × bit): the interpreted-HOF form re-evaluates
  * the token array `bits` times (same pathology as [[MinHashSig]]).
  * `bits` ≤ 32 (nibbles of an md5 digest).
  */
case class SimHashExpr(child: Expression, bits: Int)
    extends UnaryExpression {
  require(bits >= 1 && bits <= 32, "bits must be in [1, 32]")

  override def dataType: DataType = StringType
  override def prettyName: String = "simhash"

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = input.asInstanceOf[UTF8String].toString.trim.split("\\s+", -1)
    val votes = new Array[Int](bits)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    while (t < tokens.length) {
      md.reset()
      val digest = md.digest(tokens(t).getBytes("UTF-8"))
      var j = 0
      while (j < bits) {
        // hex nibble j (0-based): high half of byte j/2 when j even
        val byte = digest(j / 2) & 0xff
        val nibble = if (j % 2 == 0) byte >> 4 else byte & 0xf
        votes(j) += (if ((nibble & 0x8) != 0) 1 else -1)
        j += 1
      }
      t += 1
    }
    val sb = new java.lang.StringBuilder(bits)
    var j = 0
    while (j < bits) {
      sb.append(if (votes(j) >= 0) '1' else '0')
      j += 1
    }
    UTF8String.fromString(sb.toString)
  }

  // Real codegen (LangIdExpr recipe): reference-object call on the evaluated
  // input keeps the surrounding projection in whole-stage codegen.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("simHash", this, classOf[SimHashExpr].getName)
    defineCodeGen(ctx, ev, c => s"(UTF8String) $ref.evalHash($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def evalHash(s: UTF8String): Any = nullSafeEval(s)

  override protected def withNewChildInternal(newChild: Expression): SimHashExpr =
    copy(child = newChild)
}

/** Native 64-bit SimHash over whitespace tokens — bit-identical to the column
  * formulation (vote j = sign of Σ over tokens of (bit j of xxhash64(token,
  * seed 42) ? +1 : -1); bit j of the output set when the vote is ≥ 0), but
  * ONE xxhash64 per token instead of 64 interpreted `aggregate` passes over
  * the token array per row. This is the cheap scale path next to the
  * md5-based (oracle-checkable) [[SimHashExpr]].
  *
  * Tokenization matches `split(trim(text), "\\s+")`: UTF8String.trim strips
  * ASCII spaces only (Spark's `trim`), and the split keeps a trailing empty
  * token for the empty string — exactly the Spark column semantics.
  */
case class SimHash64Expr(child: Expression)
    extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  private[this] val ws = java.util.regex.Pattern.compile("\\s+")

  override protected def nullSafeEval(input: Any): Any = {
    val tokens = ws.split(input.asInstanceOf[UTF8String].trim.toString, -1)
    val votes = new Array[Int](64)
    var t = 0
    while (t < tokens.length) {
      val u = UTF8String.fromString(tokens(t))
      val h = XXH64.hashUnsafeBytes(u.getBaseObject, u.getBaseOffset, u.numBytes, 42L)
      var j = 0
      while (j < 64) {
        votes(j) += (if (((h >>> j) & 1L) == 1L) 1 else -1)
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 64) {
      if (votes(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }

  // Real codegen: the method returns a primitive long, so the generated
  // assignment needs no boxing or cast.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("simHash64", this, classOf[SimHash64Expr].getName)
    defineCodeGen(ctx, ev, c => s"$ref.evalHash64($c)")
  }

  /** Codegen entry point (primitive return for the generated assignment). */
  def evalHash64(s: UTF8String): Long = nullSafeEval(s).asInstanceOf[Long]

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}
