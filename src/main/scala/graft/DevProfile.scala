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
/** CodegenFallback shim shared by the A/B harnesses below: same interpreted
  * eval, same row-materialization cost a fallback expression pays inside
  * whole-stage codegen — wrapping a native expression in it reproduces its
  * pre-`doGenCode` behavior exactly.
  */
private[graft] case class NoCodegen(
    child: org.apache.spark.sql.catalyst.expressions.Expression)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: org.apache.spark.sql.types.DataType = child.dataType
  override def nullable: Boolean = child.nullable
  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = child.eval(input)
  override protected def withNewChildInternal(
      newChild: org.apache.spark.sql.catalyst.expressions.Expression): NoCodegen =
    copy(child = newChild)
}

object DevProfileLangId {

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

/** Dev harness: per-expression A/B of the round-6 `doGenCode` work
  * (`runMain graft.DevProfileCodegen [sfDir] [reps]`) — each native
  * expression vs the same expression behind the [[NoCodegen]] shim, i.e.
  * exactly its pre-round-6 CodegenFallback form, on the real corpus
  * columns each one runs over in the bench queries.
  */
object DevProfileCodegen {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/tmp/sf1"
    val reps = if (args.length > 1) args(1).toInt else 3
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import org.apache.spark.sql.{Column, GraftColumnBridge => B}
    import org.apache.spark.sql.catalyst.expressions.Expression
    import graft.functions._

    def native(e: Expression): Column = B.column(e)
    def fallback(e: Expression): Column = B.column(NoCodegen(e))

    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), col("text"),
        B.column(WordShinglesExpr(B.expression(col("text").cast("string")), 2)).as("sh"))
      .localCheckpoint(true)
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select(col("vec_id"), col("embedding").as("va"),
        reverse(col("embedding")).as("vb"),
        graft.functions.Vectors.quantizeI8(col("embedding")).as("qa"),
        graft.functions.Vectors.quantizeI8(reverse(col("embedding"))).as("qb"))
      .localCheckpoint(true)

    def t(label: String)(df: org.apache.spark.sql.DataFrame): Unit = {
      val t0 = System.nanoTime()
      val n = df.queryExecution.toRdd.count()
      println(f"PROF $label rows=$n sec=${(System.nanoTime() - t0) / 1e9}%.3f")
    }
    val cases: Seq[(String, Expression)] = Seq(
      "WordShinglesExpr" -> WordShinglesExpr(B.expression(col("text").cast("string")), 2),
      "MinHashSig16" -> MinHashSig(B.expression(col("sh")), 16),
      "MinHashSig64x16" -> MinHashSig64(B.expression(col("sh")), 16),
      "SimHashExpr16" -> SimHashExpr(B.expression(col("text").cast("string")), 16),
      "SimHash64Expr" -> SimHash64Expr(B.expression(col("text").cast("string"))))
    val vecCases: Seq[(String, Expression)] = Seq(
      "CosineSim" -> CosineSim(B.expression(col("va")), B.expression(col("vb"))),
      "CosineSimLong" -> CosineSimLong(B.expression(col("qa")), B.expression(col("qb"))))
    for (r <- 1 to reps) {
      println(s"--- rep $r ---")
      cases.foreach { case (name, e) =>
        t(s"$name-fallback")(docs.select(fallback(e).as("x")))
        t(s"$name-codegen")(docs.select(native(e).as("x")))
      }
      vecCases.foreach { case (name, e) =>
        t(s"$name-fallback")(vecs.select(fallback(e).as("x")))
        t(s"$name-codegen")(vecs.select(native(e).as("x")))
      }
    }
    spark.stop()
  }
}

/** Dev harness: q58 vocabulary-skew probe (`runMain graft.DevProfileQ58
  * [docs] [wordsPerDoc]`) — VERDICT r5 #6. Generates a synthetic Zipf
  * corpus (log-uniform rank ⇒ P(term) ∝ 1/rank, so the top term lands in
  * ~every document = the hottest possible tf⨝df join key), runs
  * [[graft.operators.TextAnalysis.tfIdfTopTerms]], and reports which join
  * strategy the tf⨝df edge actually took: (a) at defaults — does the
  * vocabulary-sized df side broadcast (no word shuffle at all)?; (b) with
  * broadcast disabled (the 100 TB case where the vocabulary outgrows the
  * threshold) — does AQE's skew-join splitting absorb the stopword key?
  * Salting gets added only if (b) shows an unsplit hot partition.
  */
object DevProfileQ58 {
  def main(args: Array[String]): Unit = {
    val docsN = if (args.length > 0) args(0).toLong else 500000L
    val wordsPerDoc = if (args.length > 1) args(1).toInt else 60
    val vocab = 200000
    val spark = Engine.session(master = "local[32]", shufflePartitions = 32, appName = "prof")
    import graft.operators.TextAnalysis
    val lnV = math.log(vocab.toDouble)
    def term(i: Int) = concat(lit("t"),
      floor(exp((pmod(xxhash64(col("id") * 131L + i.toLong), lit(1000000L)) / 1000000.0) * lnV))
        .cast("long"))
    val docs = spark.range(docsN).select(col("id").as("doc_id"),
      concat_ws(" ", (0 until wordsPerDoc).map(term): _*).as("text"))
      .localCheckpoint(true)

    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val out = TextAnalysis.tfIdfTopTerms(docs, "doc_id", "text", 3)
      val n = out.queryExecution.toRdd.count()
      val sec = (System.nanoTime() - t0) / 1e9
      val plan = out.queryExecution.executedPlan.toString
      println(f"PROF $label rows=$n sec=$sec%.3f skewSplit=${plan.contains("isSkew=true") || plan.contains("skew=true")}")
      plan.linesIterator.filter(_.contains("Join")).foreach(l => println("  JOIN " + l.trim.take(140)))
    }
    // Two alternating reps per mode: the first run of the JVM pays all the
    // codegen/JIT warmup, which would otherwise bias whichever mode goes
    // first (a single-pass version showed broadcast 2.6x "slower" purely
    // from ordering).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    for (r <- 1 to 2) {
      run(s"default-r$r")
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
      try run(s"no-broadcast-r$r")
      finally {
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
      }
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
      val candidates = Dedup.minHashLshPairsFromShingles(shingled, "__sid", "__sh", 4, 4)
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
