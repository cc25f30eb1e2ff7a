package graft

import org.apache.spark.sql.functions._

import graft.operators.Sketches

/** Engine-portable HLL: accuracy within the theoretical error band,
  * duplicate insensitivity, and register mergeability.
  */
class SketchesSpec extends SparkSpecBase {
  import spark.implicits._

  /** HLL's standard two-regime estimator: linear counting (from the
    * reported zero-bucket count) below 2.5·m, raw estimate above — the raw
    * estimator alone is biased high for small cardinalities by design.
    */
  private def corrected(rawEstimate: Double, zeroBuckets: Long): Double = {
    val m = Sketches.NumBuckets.toDouble
    if (rawEstimate <= 2.5 * m && zeroBuckets > 0) m * math.log(m / zeroBuckets)
    else rawEstimate
  }

  test("estimate lands within ~2 standard errors of the true cardinality") {
    for (n <- Seq(100, 1000, 20000)) {
      val df = spark.range(n).select(col("id").cast("string").as("v"))
      val row = Sketches.hllDistinctEstimate(df, col("v")).head()
      val est = corrected(row.getDouble(0), row.getLong(1))
      val stdErr = 1.04 / math.sqrt(Sketches.NumBuckets) // ≈ 6.5% for m=256
      assert(math.abs(est - n) / n < 2 * stdErr + 0.02,
        s"n=$n estimate=$est off by ${math.abs(est - n) / n * 100}%")
    }
  }

  test("duplicates do not move the estimate") {
    val unique = spark.range(5000).select(col("id").cast("string").as("v"))
    val withDups = unique.union(unique).union(unique)
    val a = Sketches.hllDistinctEstimate(unique, col("v")).head().getDouble(0)
    val b = Sketches.hllDistinctEstimate(withDups, col("v")).head().getDouble(0)
    assert(a === b)
  }

  test("registers merge by element-wise max (split = whole)") {
    val all = spark.range(10000).select(col("id").cast("string").as("v"))
    val left = all.filter(col("v").cast("long") < 5000)
    val right = all.filter(col("v").cast("long") >= 5000)
    val merged = Sketches.hllRegisters(left, col("v"))
      .unionByName(Sketches.hllRegisters(right, col("v")))
      .groupBy("bucket").agg(max(col("register")).as("register"))
      .orderBy("bucket").collect().map(r => (r.getString(0), r.getInt(1)))
    val whole = Sketches.hllRegisters(all, col("v"))
      .orderBy("bucket").collect().map(r => (r.getString(0), r.getInt(1)))
    assert(merged.toSeq === whole.toSeq)
  }

  test("exactMoments: hand-checked values, nulls skipped, repartition-invariant") {
    val df = Seq(("a", Some(1.0)), ("a", Some(2.0)), ("a", Some(3.0)),
      ("a", None), ("b", Some(5.0))).toDF("g", "v")
    def run(d: org.apache.spark.sql.DataFrame) =
      Sketches.exactMoments(d, Seq("g"), col("v")).orderBy("g").collect()
        .map(r => (r.getString(0), r.getLong(1),
          r.getDouble(2), if (r.isNullAt(3)) null else r.getDouble(3))).toSeq
    val out = run(df)
    assert(out(0) === (("a", 3L, 2.0, 1.0))) // var({1,2,3}) = 1, null skipped
    assert(out(1)._2 === 1L)
    assert(out(1)._4 === null)               // n=1 → variance undefined
    // decimal partials ⇒ bit-identical under any partitioning
    assert(run(df.repartition(7)) === out)
  }

  test("exactQuantilesByRank matches the single-window rank definition") {
    // deterministic pseudo-random values WITH heavy ties (v = id*37 % 1000)
    // across 3 unevenly-sized groups; tie-break through the unique id
    val n = 30000L
    val df = spark.range(n).select(
      (col("id") % 3).cast("string").as("g"),
      ((col("id") * 37) % 1000).cast("double").as("v"),
      col("id"))
      .filter(col("g") =!= "2" || col("id") < 900) // uneven group sizes
    val ps = Seq(0.25, 0.5, 0.9, 0.99)
    val got = Sketches.exactQuantilesByRank(df, "g", "v", "id", ps, buckets = 64)
      .orderBy("g", "p").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    // oracle: the definition itself, one window per group (fine at test size)
    val w = org.apache.spark.sql.expressions.Window.partitionBy("g").orderBy("v", "id")
    val ranked = df
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(
        org.apache.spark.sql.expressions.Window.partitionBy("g")))
    val want = ps.flatMap { p =>
      ranked.filter(col("rn") === ceil(lit(p) * col("n")).cast("long"))
        .select(col("g"), lit(p).as("p"), col("v")).collect()
        .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    }.sortBy(t => (t._1, t._2))
    assert(got.toSeq === want)
  }

  test("exactQuantilesByRank: single-value group and tiny groups hit the degenerate paths") {
    val df = Seq(("a", 7.0, 1L), ("a", 7.0, 2L), ("a", 7.0, 3L), // hi == lo
      ("b", 1.0, 4L),                                             // n = 1
      ("c", 2.0, 5L), ("c", 1.0, 6L))                             // ceils coincide
      .toDF("g", "v", "id")
    val out = Sketches.exactQuantilesByRank(df, "g", "v", "id", Seq(0.5, 0.9), buckets = 8)
      .orderBy("g", "p").collect().map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    assert(out.toSeq === Seq(
      ("a", 0.5, 7.0), ("a", 0.9, 7.0),
      ("b", 0.5, 1.0), ("b", 0.9, 1.0),
      ("c", 0.5, 1.0), ("c", 0.9, 2.0)))
  }

  test("exactQuantilesByRank sorts only located buckets, never a whole group") {
    // the scale pin (VERDICT r4 #2): with one group of 40k rows and B=100
    // buckets, the rows reaching the rank window must be ≈ located buckets
    // × n/B — NOT the n-row group the old partitionBy(group) window sorted
    val n = 40000L
    val df = spark.range(n).select(
      lit("g").as("g"), ((col("id") * 131) % 7919).cast("double").as("v"), col("id"))
    val prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false") // static plan exposes metrics
    try {
      val q = Sketches.exactQuantilesByRank(df, "g", "v", "id", Seq(0.5, 0.9), buckets = 100)
      q.collect()
      val semiRows = q.queryExecution.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BaseJoinExec
            if j.joinType == org.apache.spark.sql.catalyst.plans.LeftSemi =>
          j.metrics.get("numOutputRows").map(_.value).getOrElse(0L)
      }
      assert(semiRows.nonEmpty)
      // 2 quantiles → ≤ 2 located buckets of ≈ 400 rows each (+ skew slack)
      assert(semiRows.forall(_ <= n / 10),
        s"rank window consumed a whole group: $semiRows rows passed the bucket semi-join")
    } finally spark.conf.set("spark.sql.adaptive.enabled", prev)
  }
}
