package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** RFC 4122 name-based UUIDs (version 5, SHA-1; version 3, MD5).
  *
  * The reference derives every Cassandra room id as
  * `uuid5(NAMESPACE_OID, mongo_id)` (reference
  * `etl/utils/cassandra_id_mapper.py:45-71`) — a deterministic function that
  * *replaces* a key-lookup join, which is the design we keep: referential
  * integrity by construction, no shuffle, no state.
  *
  * Implemented as a native Catalyst expression (not a Scala UDF) so it stays
  * inside whole-stage codegen, folds over constants, and propagates nulls.
  */
object Uuid5 {

  /** RFC 4122 Appendix C namespaces. */
  val NamespaceDns: Array[Byte] = uuidBytes("6ba7b810-9dad-11d1-80b4-00c04fd430c8")
  val NamespaceUrl: Array[Byte] = uuidBytes("6ba7b811-9dad-11d1-80b4-00c04fd430c8")
  val NamespaceOid: Array[Byte] = uuidBytes("6ba7b812-9dad-11d1-80b4-00c04fd430c8")

  /** App-defined namespace whose 16 bytes are ASCII (`graft3:namespace`), so
    * external SQL oracles can rebuild the md5 preimage as plain text —
    * RFC 4122 §4.3 explicitly allows application-chosen namespace ids.
    */
  val NamespaceGraft: Array[Byte] =
    "graft3:namespace".getBytes(java.nio.charset.StandardCharsets.US_ASCII)

  def uuidBytes(uuid: String): Array[Byte] = {
    val hex = uuid.replace("-", "")
    Array.tabulate(16)(i => Integer.parseInt(hex.substring(2 * i, 2 * i + 2), 16).toByte)
  }

  /** uuid5(NAMESPACE_OID, name) — matches Python's `uuid.uuid5`. */
  def compute(name: UTF8String): UTF8String = compute(NamespaceOid, name)

  def compute(namespace: Array[Byte], name: UTF8String): UTF8String = {
    val md = MessageDigest.getInstance("SHA-1")
    md.update(namespace)
    md.update(name.getBytes)
    format(md.digest(), version = 5)
  }

  def computeV3(namespace: Array[Byte], name: UTF8String): UTF8String = {
    val md = MessageDigest.getInstance("MD5")
    md.update(namespace)
    md.update(name.getBytes)
    format(md.digest(), version = 3)
  }

  /** First 16 digest bytes with RFC 4122 version/variant bits, canonical text. */
  private def format(digest: Array[Byte], version: Int): UTF8String = {
    val b = java.util.Arrays.copyOf(digest, 16)
    b(6) = ((b(6) & 0x0f) | (version << 4)).toByte
    b(8) = ((b(8) & 0x3f) | 0x80).toByte
    val sb = new java.lang.StringBuilder(36)
    var i = 0
    while (i < 16) {
      if (i == 4 || i == 6 || i == 8 || i == 10) sb.append('-')
      sb.append(Character.forDigit((b(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(b(i) & 0xf, 16))
      i += 1
    }
    UTF8String.fromString(sb.toString)
  }
}

/** `uuid5(name)` with the OID namespace — deterministic, codegen'd. */
case class Uuid5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid5"

  override protected def nullSafeEval(input: Any): Any =
    Uuid5.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.Uuid5.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): Uuid5Expr =
    copy(child = newChild)
}

/** `uuid3(name)` — RFC 4122 v3 (MD5) with the graft ASCII namespace. Same
  * minting contract as [[Uuid5Expr]]; MD5-based with an ASCII namespace so an
  * external SQL oracle (which may lack SHA-1 and raw-byte hashing) can
  * recompute it independently as `md5('graft3:namespace' || name)`.
  */
case class Uuid3Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override def prettyName: String = "uuid3"

  override protected def nullSafeEval(input: Any): Any =
    Uuid5.computeV3(Uuid5.NamespaceGraft, input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.functions.Uuid5.computeV3(graft.functions.Uuid5.NamespaceGraft(), $c)")

  override protected def withNewChildInternal(newChild: Expression): Uuid3Expr =
    copy(child = newChild)
}
