package graft

import org.apache.spark.sql.functions._

import graft.operators.Dedup

/** Dev harness: stage-by-stage timing of the MinHash-LSH pipeline. */
object DevProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    val shingles = Dedup.wordShingles(col("text"), 2)
    t("shingles")(docs.select(col("doc_id"), shingles.as("s")).agg(sum(size(col("s")))).head().getLong(0))
    val sig = Dedup.minHashSignature(shingles, 16)
    t("signature")(docs.select(col("doc_id"), sig.as("g")).agg(sum(size(col("g")))).head().getLong(0))
    val bandsCol = Dedup.lshBands(sig, 4, 2)
    t("bands")(docs.select(col("doc_id"), bandsCol.as("b")).agg(sum(size(col("b")))).head().getLong(0))
    val banded = docs.select(col("doc_id").as("doc"), posexplode(bandsCol)).toDF("doc", "band", "bucket")
    t("banded")(banded.count())
    val a = banded.toDF("id1", "band", "bucket")
    val b = banded.toDF("id2", "band", "bucket")
    t("rawjoin")(a.join(b, Seq("band", "bucket")).filter(col("id1") < col("id2")).count())
    t("full")(Dedup.minHashLshPairs(docs, "doc_id", "text", 2, 4, 2).count())
    spark.stop()
  }
}

/** Dev harness: A/B of LangIdExpr with real codegen vs the pre-round-5
  * CodegenFallback path (`runMain graft.DevProfileLangId [rows] [reps]`).
  * The fallback is reproduced by wrapping the expression in a
  * CodegenFallback shim — same interpreted eval, same row materialization
  * cost the fallback paid inside whole-stage codegen.
  */
object DevProfileLangId {
  import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
  import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
  import org.apache.spark.sql.types.DataType

  private case class NoCodegen(child: Expression) extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = child.dataType
    override def nullable: Boolean = child.nullable
    override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = child.eval(input)
    override protected def withNewChildInternal(newChild: Expression): NoCodegen =
      copy(child = newChild)
  }

  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import org.apache.spark.sql.GraftColumnBridge
    import graft.operators.TextAnalysis

    val words = Seq("the", "cat", "and", "dog", "la", "casa", "der", "hund",
      "xyzzy", "of", "to", "is", "le", "des", "nicht", "que")
    val base = spark.range(rows).select(
      concat_ws(" ", (0 until 12).map(i =>
        element_at(typedLit(words), (pmod(col("id") * 31 + i * 7, lit(words.size)) + 1).cast("int"))): _*)
        .as("text"))
      .localCheckpoint(true)

    def langIdWrapped(text: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      GraftColumnBridge.column(NoCodegen(graft.functions.LangIdExpr(
        GraftColumnBridge.expression(split(lower(trim(text)), "\\s+")),
        TextAnalysis.LangMarkers)))

    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      t("fallback")(base.select(langIdWrapped(col("text")).as("lang")))
      t("codegen")(base.select(TextAnalysis.languageId(col("text")).as("lang")))
    }
    spark.stop()
  }
}

/** Dev harness: A/B of the timeuuid formulations on synthetic rows
  * (`runMain graft.DevProfileTimeUuid [rows] [reps]`): the legacy
  * f-interpolator UDF, the optimized-compute UDF, and the native
  * [[graft.functions.TimeUuidExpr]]. VERDICT r4 item 3: measure before
  * nativizing.
  */
object DevProfileTimeUuid {
  def main(args: Array[String]): Unit = {
    val rows = if (args.length > 0) args(0).toLong else 2000000L
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import graft.functions.TimeUuid

    // the pre-round-5 formatter, verbatim — isolates the String.format cost
    def legacyCompute(epochMicros: Long, seed: String): String = {
      val t = epochMicros * 10L + TimeUuid.GregorianOffset100Ns
      val timeLow = t & 0xffffffffL
      val timeMid = (t >>> 32) & 0xffffL
      val timeHiVersion = ((t >>> 48) & 0x0fffL) | 0x1000L
      val md = java.security.MessageDigest.getInstance("SHA-1").digest(seed.getBytes("UTF-8"))
      val clockSeq = (((md(0) & 0x3f) | 0x80) << 8) | (md(1) & 0xff)
      val node = ((md(2) & 0xffL) << 40) | ((md(3) & 0xffL) << 32) |
        ((md(4) & 0xffL) << 24) | ((md(5) & 0xffL) << 16) |
        ((md(6) & 0xffL) << 8) | (md(7) & 0xffL)
      f"$timeLow%08x-$timeMid%04x-$timeHiVersion%04x-$clockSeq%04x-$node%012x"
    }
    val legacyUdf = udf(legacyCompute _)
    val currentUdf = udf((m: Long, s: String) => TimeUuid.compute(m, s))
    def nativeCol(m: org.apache.spark.sql.Column, s: org.apache.spark.sql.Column) = {
      import org.apache.spark.sql.GraftColumnBridge
      GraftColumnBridge.column(graft.functions.TimeUuidExpr(
        GraftColumnBridge.expression(m), GraftColumnBridge.expression(s)))
    }

    val base = spark.range(rows).select(
      (col("id") * 1000L + 1500000000000000L).as("micros"),
      concat(lit("seed-"), col("id")).as("seed"))
      .localCheckpoint(true)

    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      t("legacy-udf")(base.select(legacyUdf(col("micros"), col("seed")).as("u")))
      t("current-udf")(base.select(currentUdf(col("micros"), col("seed")).as("u")))
      t("native-expr")(base.select(nativeCol(col("micros"), col("seed")).as("u")))
    }
    spark.stop()
  }
}

/** Dev harness: stage-by-stage timing of [[graft.operators.Curation.pipeline]]
  * with q33's parameters (`runMain graft.DevProfileCuration [sfDir] [reps]`).
  */
object DevProfileCuration {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val reps = if (args.length > 1) args(1).toInt else 2
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import graft.operators.{Curation, Dedup, TextAnalysis}

    def t(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }

    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      t("read")(docs.count())
      val surv = Dedup.exactSurvivors(docs, TextAnalysis.fingerprint(col("text")), "doc_id")
      t("exactSurvivors")(surv.count())
      val gated = surv.filter(TextAnalysis.qualityScore(col("text")) >= 0.3 &&
        TextAnalysis.languageId(col("text")).isin("en", "es", "fr", "de", "zh"))
      t("gated")(gated.count())
      val shingled = gated.select(col("doc_id").as("__sid"),
        Dedup.wordShingles(col("text"), 2).as("__sh")).localCheckpoint(false)
      val candidates = Dedup.minHashLshPairsFromShingles(shingled, "__sid", "__sh", 4, 3)
      t("candidates")(candidates.count())
      val confirmed = candidates
        .join(shingled.withColumnRenamed("__sid", "id1").withColumnRenamed("__sh", "__sh1"), "id1")
        .join(shingled.withColumnRenamed("__sid", "id2").withColumnRenamed("__sh", "__sh2"), "id2")
        .filter(Dedup.jaccard(col("__sh1"), col("__sh2")) >= 0.6)
        .select(col("id2").as("doc_id")).distinct()
      t("confirmed")(confirmed.count())
      t("full-pipeline")(Curation.pipeline(docs, "doc_id", "text").count())
    }
    spark.stop()
  }
}
