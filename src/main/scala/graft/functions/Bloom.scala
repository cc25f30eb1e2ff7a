package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built, plan-embedded Bloom filter:
  * `bloom_might_contain(gram)` — true if `gram` MAY be in the set the
  * filter was built over (false positives at the filter's fpp; never false
  * negatives).
  *
  * This is the pruning half of the bloom-prune + exact-verify
  * decontamination path ([[graft.operators.Dedup.contaminatedIdsBloom]]):
  * the filter rides the plan as a byte array (a few MB for eval-set-sized
  * gram sets — broadcast-cheap where the exact distinct-gram table no
  * longer is), executors deserialize it once per JVM (transient lazy), and
  * the probe is a read-only hash loop — safe across task threads. Per row
  * it costs one `UTF8String.getBytes` (which copies unless the string
  * exactly spans its backing array) plus the hash loop; the filter itself
  * is never touched per row.
  *
  * Equality is by filter CONTENT (`Arrays.equals`), not array reference —
  * a case class holding a raw `Array[Byte]` would otherwise never compare
  * equal to a semantically identical probe, defeating canonicalization and
  * common-subexpression elimination when the same filter is probed twice
  * in one plan.
  *
  * Membership convention: UTF-8 bytes via putBinary/mightContainBinary on
  * BOTH the build and probe side — the builder
  * ([[graft.operators.Dedup.buildGramBloom]]) must use the same encoding,
  * which is why both live behind one API instead of reusing
  * `DataFrameStatFunctions.bloomFilter` (whose put encoding is an
  * implementation detail we would silently depend on).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  @transient private lazy val filter: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override protected def nullSafeEval(input: Any): Any = {
    val s = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String]
    filter.mightContainBinary(s.getBytes)
  }

  override protected def doGenCode(
      ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
      ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
      : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
    val ref = ctx.addReferenceObj("bloomMightContain", this, classOf[BloomMightContain].getName)
    defineCodeGen(ctx, ev, c => s"$ref.probe($c)")
  }

  /** Codegen entry point (nullSafeEval is protected in the Java view). */
  def probe(s: org.apache.spark.unsafe.types.UTF8String): Boolean =
    filter.mightContainBinary(s.getBytes)

  override def equals(other: Any): Boolean = other match {
    case b: BloomMightContain =>
      child == b.child && java.util.Arrays.equals(filterBytes, b.filterBytes)
    case _ => false
  }
  // cached: Catalyst hashes expressions repeatedly during planning
  // (ExpressionSet, EquivalentExpressions) and the filter is MB-sized
  @transient private lazy val filterBytesHash: Int =
    java.util.Arrays.hashCode(filterBytes)
  override def hashCode(): Int =
    31 * child.hashCode() + filterBytesHash

  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}
