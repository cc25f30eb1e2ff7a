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

  test("saltedJoin spreads a degenerate key across partitions (skew fixture)") {
    // 100k-row fact where ONE key holds ~99.9% of the rows. Skew-safety is
    // asserted via per-partition row counts of the join output (the join's
    // exchange hashes on (key, salt)): without the salt every hot-key row
    // lands in one task; salted, no partition may dominate.
    val n = 100000
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    val prevBc = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // no AQE coalesce/skew-split help
    // model the large⨝large case the salt exists for: no broadcast escape
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val fact = spark.range(n).select(
        when(col("id") % 1000 === 0, lit("cold")).otherwise(lit("hot")).as("key"),
        col("id").as("row_id"))
      val dim = Seq(("hot", "H"), ("cold", "C")).toDF("key", "label")
      val salted = Skew.saltedJoin(fact, dim, "key", "row_id", saltFactor = 32)
      val perPart = salted.groupBy(spark_partition_id().as("p")).count()
        .collect().map(_.getLong(1))
      assert(perPart.sum === n)
      val maxShare = perPart.max.toDouble / n
      assert(perPart.length >= 4, s"hot key stayed in ${perPart.length} partitions")
      assert(maxShare < 0.5, f"dominant partition holds $maxShare%.2f of the rows")

      val unsalted = fact.join(dim, Seq("key"))
      val unsaltedPerPart = unsalted.groupBy(spark_partition_id().as("p")).count()
        .collect().map(_.getLong(1))
      // the contrast: the plain join concentrates the hot key in one task
      assert(unsaltedPerPart.max.toDouble / n > 0.99)
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", prev)
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevBc)
    }
  }

  test("saltedGroupAgg: two-phase collect matches single-phase counts") {
    val df = (1 to 100).map(i => ("room1", i.toLong)).toDF("room", "msg_id")
    val out = Skew.saltedGroupAgg(df, "room", "msg_id", saltFactor = 4,
      partialAggs = Seq(collect_list(col("msg_id")).as("part")),
      finalAggs = Seq(size(flatten(collect_list(col("part")))).as("n")))
    assert(out.head().getAs[Int]("n") === 100)
  }
}
