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

/** 64-bit MinHash signature — the scale twin of [[MinHashSig]] (same
  * relationship as `fingerprint64` to the md5 fingerprint). [[MinHashSig]]
  * computes `numHashes` full md5 digests PER SHINGLE because that form is
  * recomputable by an external SQL oracle; at cluster scale the oracle
  * constraint doesn't apply and the standard one-hash-plus-K-permutations
  * construction (Broder's original min-wise scheme) does the same job with
  * ONE xxhash64 per shingle: element k = min over shingles of
  * `A(k) * xxh64(shingle) + B(k)` (unsigned), with `A(k)` odd so each map
  * is a bijection on Z/2^64. ~`numHashes`× less hashing per shingle and
  * 8-byte signature elements instead of 32-char hex (4× lighter bands and
  * shuffles). Not oracle-recomputable (DuckDB has no xxhash64) — covered by
  * spec fixtures and the driver's rows-only check instead.
  *
  * Null shingles are skipped ([[MinHashSig]] semantics); an empty/all-null
  * array yields all-ones (unsigned max, the "~" sentinel's ordering twin).
  */
case class MinHashSig64(child: Expression, numHashes: Int)
    extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "minhash_sig64"

  private lazy val as: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashSig64.mix(2L * k) | 1L)
  private lazy val bs: Array[Long] =
    Array.tabulate(numHashes)(k => MinHashSig64.mix(2L * k + 1L))

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val mins = Array.fill(numHashes)(-1L) // unsigned max sentinel
    var i = 0
    val n = arr.numElements()
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        val h = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, MinHashSig64.Seed)
        var k = 0
        while (k < numHashes) {
          val v = as(k) * h + bs(k)
          if (java.lang.Long.compareUnsigned(v, mins(k)) < 0) mins(k) = v
          k += 1
        }
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("minHashSig64", this, classOf[MinHashSig64].getName)
    defineCodeGen(ctx, ev, c => s"(ArrayData) $ref.evalSig($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def evalSig(arr: ArrayData): Any = nullSafeEval(arr)

  override protected def withNewChildInternal(newChild: Expression): MinHashSig64 =
    copy(child = newChild)
}

object MinHashSig64 {
  /** xxhash64 seed — Spark's default (`xxhash64(...)` the SQL function). */
  private[functions] val Seed = 42L

  /** splitmix64 finalizer: derives the per-row affine constants from k. */
  private[functions] def mix(z0: Long): Long = {
    var z = z0 + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }
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

/** Per-element xxhash64 of a string array: `[xxhash64(a[0]), ...]`,
  * order-preserving. Seed 42 = Spark's `xxhash64(...)` SQL default, so each
  * element is bit-identical to `transform(arr, x -> xxhash64(x))` — the
  * interpreted-HOF formulation this replaces (no codegen, ~10µs/lambda; see
  * [[MinHashSig]]).
  *
  * Purpose: shrink the payload the curation pipeline's Jaccard-verification
  * join shuffles. Candidate pairs replicate each document's shingle array
  * ~2x per confirmed neighbor; hashing shingles to longs cuts that payload
  * from avg-length UTF-8 strings (plus per-element offsets) to fixed 8-byte
  * elements, and Jaccard over the hashed arrays equals Jaccard over the
  * strings up to 64-bit collisions (~n²/2⁶⁴ per document — negligible at
  * any real shingle count). Distinctness is preserved the same way:
  * [[graft.operators.Dedup.wordShingles]] emits distinct shingles, and
  * distinct strings keep distinct hashes w.h.p.
  */
case class XxHash64Array(child: Expression) extends UnaryExpression {

  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "xxhash64_array"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](n)
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val s = arr.getUTF8String(i)
        out(i) = org.apache.spark.sql.catalyst.expressions.XXH64
          .hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, MinHashSig64.Seed)
      } else {
        // xxhash64(NULL) = the seed in Spark SQL (hash of zero bytes is the
        // running state = seed) — match it so the transform() bit-identity
        // claim above holds for nullable element arrays too, not only for
        // wordShingles' containsNull=false output
        out(i) = MinHashSig64.Seed
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("xxhash64Array", this, classOf[XxHash64Array].getName)
    defineCodeGen(ctx, ev, c => s"(ArrayData) $ref.evalArr($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def evalArr(arr: ArrayData): Any = nullSafeEval(arr)

  override protected def withNewChildInternal(newChild: Expression): XxHash64Array =
    copy(child = newChild)
}
