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
}
