package graft

import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

import graft.functions.Uuid5

/** K1 parity: uuid5 must match Python's `uuid.uuid5` byte-for-byte (the
  * reference mints every room id this way — `etl/utils/cassandra_id_mapper.py:45-71`,
  * oracle-checked by `scripts/validate_migration.py:250-262`). Vectors below
  * were generated with CPython's uuid module.
  */
class Uuid5Spec extends SparkSpecBase {

  private def u5(name: String): String =
    Uuid5.compute(UTF8String.fromString(name)).toString

  test("uuid5 OID-namespace vectors match CPython uuid.uuid5") {
    assert(u5("1") === "996ad860-2a9a-504f-8861-aeafd0b2ae29")
    assert(u5("42") === "ba293c61-ad33-57b9-9671-f3319f57d789")
    assert(u5("graft") === "f7bbec12-a5b3-5843-96ce-77efebb36105")
    assert(u5("") === "0a68eb57-c88a-5f34-9e9d-27f85e68af4f")
  }

  test("uuid5 DNS-namespace vector matches the classic python.org example") {
    assert(Uuid5.compute(Uuid5.NamespaceDns, UTF8String.fromString("python.org")).toString
      === "886313e1-3b8a-5372-9b90-0c9aee199e5d")
  }

  test("uuid3 graft-namespace vector matches md5('graft3:namespace'||name) surgery") {
    assert(Uuid5.computeV3(Uuid5.NamespaceGraft, UTF8String.fromString("1")).toString
      === "9453c9a8-572f-3686-9da5-8e742ffef736")
  }

  test("version and variant bits are set per RFC 4122") {
    for (n <- Seq("a", "b", "c", "d", "e")) {
      val v5 = u5(n)
      assert(v5.charAt(14) === '5')
      assert("89ab".contains(v5.charAt(19)))
      val v3 = Uuid5.computeV3(Uuid5.NamespaceGraft, UTF8String.fromString(n)).toString
      assert(v3.charAt(14) === '3')
      assert("89ab".contains(v3.charAt(19)))
    }
  }

  test("expression evaluates through codegen, SQL registration, and propagates null") {
    import spark.implicits._
    val df = Seq(Some("1"), None).toDF("k")
      .select(GraftFunctions.uuid5(col("k")).as("u"))
    val rows = df.collect()
    assert(rows(0).getString(0) === "996ad860-2a9a-504f-8861-aeafd0b2ae29")
    assert(rows(1).isNullAt(0))
    val viaSql = spark.sql("SELECT uuid5('42') AS u, uuid3('1') AS v").head()
    assert(viaSql.getString(0) === "ba293c61-ad33-57b9-9671-f3319f57d789")
    assert(viaSql.getString(1) === "9453c9a8-572f-3686-9da5-8e742ffef736")
  }

  test("optimizer rule rewrites uuid5(a)=uuid5(b) join conditions to a=b") {
    import spark.implicits._
    val a = Seq("x", "y").toDF("ka")
    val b = Seq("y", "z").toDF("kb")
    val joined = a.join(b,
      GraftFunctions.uuid5(col("ka")) === GraftFunctions.uuid5(col("kb")))
    val optimized = joined.queryExecution.optimizedPlan.toString
    assert(!optimized.toLowerCase.contains("uuid5"),
      s"rule should eliminate uuid5 from the join condition:\n$optimized")
    assert(joined.count() === 1)
  }

  test("deterministic and distinct across distinct names") {
    val names = (0 until 1000).map(_.toString)
    val ids = names.map(u5)
    assert(ids.distinct.size === names.size)
    assert(names.map(u5) === ids)
  }
}
