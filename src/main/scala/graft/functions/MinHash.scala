package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature: element k = min over the input shingle array of
  * md5("k:" ++ shingle), hex-encoded — bit-identical to the pure-column
  * formulation `array_min(transform(shingles, s -> md5(concat('k:', s))))`
  * per seed, so an external SQL oracle can recompute it.
  *
  * Why a custom expression: higher-order functions are interpreted (no
  * whole-stage codegen, no common-subexpression elimination), which puts
  * ~10µs of lambda-evaluation overhead on every hash. K×|shingles| hashes
  * per document made LSH the bench outlier (~33 s at sf0.1). This is one
  * tight JVM loop per row with a reused MessageDigest: minima are kept as
  * raw 16-byte digests (unsigned byte order == hex lexicographic order) and
  * hex-encoded once at the end. Null shingle elements are skipped (matching
  * `array_min`/`least` null semantics); an empty array yields the "~"
  * sentinel, which sorts above any md5 hex.
  */
case class MinHashSig(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_sig"

  // "k:" prefixes, precomputed once per expression instance
  private lazy val prefixes: Array[Array[Byte]] =
    Array.tabulate(numHashes)(k => s"$k:".getBytes("UTF-8"))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = new Array[Array[Byte]](numHashes)
    val md = MessageDigest.getInstance("MD5")
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i).getBytes
        var k = 0
        while (k < numHashes) {
          md.reset()
          md.update(prefixes(k))
          md.update(s)
          val d = md.digest()
          if (mins(k) == null || MinHashSig.unsignedLess(d, mins(k))) mins(k) = d
          k += 1
        }
      }
      i += 1
    }
    val out = new Array[AnyRef](numHashes)
    var k = 0
    while (k < numHashes) {
      out(k) =
        if (mins(k) == null) UTF8String.fromString("~")
        else UTF8String.fromString(MinHashSig.hex(mins(k)))
      k += 1
    }
    new GenericArrayData(out)
  }

  // Real codegen (LangIdExpr recipe): one virtual call on the already-
  // evaluated shingle array keeps the projection inside whole-stage codegen
  // instead of the fallback's per-call input-row materialization.
  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig", this, classOf[MinHashSig].getName)
    defineCodeGen(ctx, ev, c => s"(ArrayData) $ref.evalSig($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def evalSig(arr: ArrayData): Any = nullSafeEval(arr)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashSig {

  def unsignedLess(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      val x = a(i) & 0xff
      val y = b(i) & 0xff
      if (x != y) return x < y
      i += 1
    }
    false
  }

  private val HexDigits = "0123456789abcdef".toCharArray

  def hex(b: Array[Byte]): String = {
    val sb = new Array[Char](b.length * 2)
    var i = 0
    while (i < b.length) {
      sb(2 * i) = HexDigits((b(i) >> 4) & 0xf)
      sb(2 * i + 1) = HexDigits(b(i) & 0xf)
      i += 1
    }
    new String(sb)
  }
}
