package graft

import org.apache.spark.sql.functions._

import graft.operators.Skew

/** Salted skew-join/agg equivalence: results must match the unsalted plan
  * exactly (the salt only changes data placement).
  */
class SkewSpec extends SparkSpecBase {
  import spark.implicits._

  test("saltedJoin equals the plain join on a skewed key") {
    val fact = (1 to 1000).map(i => (if (i % 10 == 0) "cold" else "hot", i.toLong))
      .toDF("key", "row_id")
    val dim = Seq(("hot", "H"), ("cold", "C")).toDF("key", "label")
    val plain = fact.join(dim, Seq("key")).groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = Skew.saltedJoin(fact, dim, "key", "row_id", saltFactor = 8)
      .groupBy("label").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted === plain)
    assert(salted("H") === 900L)
  }

  test("saltedGroupAgg: two-phase collect matches single-phase counts") {
    val df = (1 to 100).map(i => ("room1", i.toLong)).toDF("room", "msg_id")
    val out = Skew.saltedGroupAgg(df, "room", "msg_id", saltFactor = 4,
      partialAggs = Seq(collect_list(col("msg_id")).as("part")),
      finalAggs = Seq(size(flatten(collect_list(col("part")))).as("n")))
    assert(out.head().getAs[Int]("n") === 100)
  }
}
