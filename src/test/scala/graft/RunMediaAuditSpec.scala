package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types._

import graft.operators.Multimodal

/** The media-audit production CLI: mixed-modality corpus in → decode
  * audits + content fingerprints + near-dup pairs out through the sink
  * layer, with per-modality decode health reported from observe metrics
  * (the RunTrainPrep discipline).
  */
class RunMediaAuditSpec extends SparkSpecBase {

  test("execute audits a mixed corpus: per-modality health counts, artifacts, pairs") {
    def gray(id: Long) = Array.tabulate[Byte](128)(i => ((id * (i + 1)) % 256).toByte)
    def wav(id: Long) = Multimodal.WavCodec.encode(8000, 1,
      Array.tabulate[Short](160)(i => ((id * (i + 3)) % 256).toShort))
    def clip(id: Long) = (0 until 4).toArray.flatMap { f =>
      Multimodal.PgmCodec.encode(16, 8, 255,
        Array.tabulate[Byte](128)(i => ((id * (i + 1) + 17 * f) % 256).toByte))
    }
    val rows = Seq(
      // images: a PGM, a PNG (AutoImageCodec must decode BOTH), a dup of
      // the PGM under a different container (PNG of the same pixels —
      // pixel-identical → identical aHash → a 0-hamming pair), one garbage
      Row(1L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(1L))),
      Row(2L, "image", Multimodal.PngCodec.encode(16, 8, gray(7L))), // 7: ids 1/2 HASH-COLLIDE
      Row(3L, "image", Multimodal.PngCodec.encode(16, 8, gray(1L))),
      Row(4L, "image", "not an image".getBytes("US-ASCII")),
      // audio: two clips, an exact-content dup (id 13 ≡ same synth as 11
      // would need id≡ mod 256 — use the SAME samples instead), one garbage
      Row(11L, "audio", wav(11L)),
      Row(12L, "audio", wav(12L)),
      Row(13L, "audio", wav(11L)),
      Row(14L, "audio", Array[Byte](9, 9, 9)),
      // video: two 4-frame clips, a dup, one corrupt container
      Row(21L, "video", clip(21L)),
      Row(22L, "video", clip(22L)),
      Row(23L, "video", clip(21L)),
      Row(24L, "video", clip(24L) ++ "trailing garbage".getBytes("US-ASCII")),
      // modality no branch matches — must surface as UNAUDITED, not vanish
      Row(31L, "text", "plain text payload".getBytes("US-ASCII")),
      Row(32L, "text", "another one".getBytes("US-ASCII")))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-audit").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")

    val cfg = RunMediaAudit.parse(Seq("--in", s"$tmp/in", "--out", s"$tmp/out", "--pairs"))
    val report = RunMediaAudit.execute(spark, cfg)

    assert(report.modalities("image") === RunMediaAudit.ModalityReport(4L, 1L, 1L))
    assert(report.modalities("audio") === RunMediaAudit.ModalityReport(4L, 1L, 1L))
    assert(report.modalities("video") === RunMediaAudit.ModalityReport(4L, 1L, 1L))
    // the unmatched modality is DISCLOSED, not silently skipped
    assert(report.unauditedRows === 2L && report.unauditedModalities === 1L)
    assert(report.unauditedTop === Seq("text" -> 2L))
    // no replica clusters and no --max-bucket: the guard never activates
    assert(report.guard.isEmpty)

    // the pair artifacts carry the planted duplicates (and only them)
    def pairs(name: String) = spark.read.parquet(s"$tmp/out/media_${name}_pairs")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(pairs("image") === Set((1L, 3L, 0)))  // PGM ≡ PNG of the same pixels
    assert(pairs("audio") === Set((11L, 13L, 0)))
    assert(pairs("video") === Set((21L, 23L, 0)))

    // ONE-pass audit artifacts: stats AND hashes in the same row; −1/null
    // degradation rows present, not dropped
    val img = spark.read.parquet(s"$tmp/out/media_image_audit")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.isNullAt(4))).toMap
    assert(img(4L) === ((-1, true)) && img(1L)._1 === 16 && !img(1L)._2)
    val aud = spark.read.parquet(s"$tmp/out/media_audio_audit")
      .collect().map(r => r.getLong(0) -> (r.getInt(1), r.isNullAt(7))).toMap
    assert(aud(14L) === ((-1, true)) && aud(11L)._1 === 8000 && !aud(11L)._2)
    // the combined audit row equals the standalone operators' outputs
    val standalone = Multimodal.audioStats(media.filter(r => r.getString(1) == "audio"))
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    val combined = spark.read.parquet(s"$tmp/out/media_audio_audit")
      .collect().map(r => r.getLong(0) -> r.toSeq.slice(1, 7)).toMap
    for ((k, v) <- standalone) assert(combined(k) === v, s"id=$k")
    // corrupt video container → null fingerprint, n_frames 0
    val vid = spark.read.parquet(s"$tmp/out/media_video_audit")
      .collect().map(r => r.getLong(0) -> (r.isNullAt(1), r.getLong(3))).toMap
    assert(vid(24L) === ((true, 0L)) && vid(21L)._2 === 4L)
  }

  test("--max-bucket + --dedup: guard star-collapses replica clusters with a " +
      "disclosed report, survivors close the pair graph; dirty modality " +
      "columns summarize bounded (VERDICT r12 next #1/#2, ADVICE r12)") {
    def gray(id: Long) = Array.tabulate[Byte](128)(i => ((id * (i + 1)) % 256).toByte)
    def wav(id: Long) = Multimodal.WavCodec.encode(8000, 1,
      Array.tabulate[Short](160)(i => ((id * (i + 3)) % 256).toShort))
    // replica-heavy: 8 copies of one image + 2 distinct; 6 copies of one
    // clip + 2 distinct; a dirty free-text modality column with more
    // distinct junk values than the top-5 disclosure keeps
    val rows =
      (1L to 8L).map(id => Row(id, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(500L)))) ++
      Seq(Row(9L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(9L))),
        Row(10L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(10L)))) ++
      (21L to 26L).map(id => Row(id, "audio", wav(700L))) ++
      Seq(Row(27L, "audio", wav(27L)), Row(28L, "audio", wav(28L))) ++
      (1L to 7L).map(i => Row(100L + i, s"junk-$i", Array[Byte](1))) ++
      Seq(Row(110L, "junk-1", Array[Byte](2)))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-guard").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")

    val cfg = RunMediaAudit.parse(Seq("--in", s"$tmp/in", "--out", s"$tmp/out",
      "--pairs", "--max-bucket", "3", "--dedup"))
    val report = RunMediaAudit.execute(spark, cfg)

    // image: 8-replica cluster star-collapses to 7 pairs (not C(8,2)=28);
    // survivors = min id of the cluster + the two distinct + nothing lost
    assert(report.modalities("image") === RunMediaAudit.ModalityReport(10L, 0L, 7L, 3L))
    assert(report.modalities("audio") === RunMediaAudit.ModalityReport(8L, 0L, 5L, 3L))
    assert(report.modalities("video") === RunMediaAudit.ModalityReport(0L, 0L, 0L, 0L))
    // guard activation is attributed per modality and DISCLOSED; the
    // counters are per-band EMISSIONS (the guardedBandPairs contract —
    // 7 stars × 4 bands; multi-band callers distinct() afterward)
    assert(report.guard.keySet === Set("image", "audio"))
    assert(report.guard("image")("star_pairs") === 28L)
    assert(report.guard("audio")("star_pairs") === 20L)
    val survivors = spark.read.parquet(s"$tmp/out/media_image_survivors")
      .collect().map(_.getLong(0)).toSet
    assert(survivors === Set(1L, 9L, 10L))
    val aSurvivors = spark.read.parquet(s"$tmp/out/media_audio_survivors")
      .collect().map(_.getLong(0)).toSet
    assert(aSurvivors === Set(21L, 27L, 28L))
    // dirty modality column: bounded top-5 summary, exact totals
    assert(report.unauditedRows === 8L && report.unauditedModalities === 7L)
    assert(report.unauditedTop.length === 5)
    assert(report.unauditedTop.head === ("junk-1" -> 2L))
  }

  test("non-string modality columns report instead of throwing (ADVICE r12)") {
    // an integer modality column matches no branch; the disclosure must
    // stringify it, not ClassCastException after the artifacts are written
    val rows = Seq(Row(1L, 7, Array[Byte](1)), Row(2L, 7, Array[Byte](2)),
      Row(3L, 9, Array[Byte](3)))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", IntegerType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-int").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")
    val report = RunMediaAudit.execute(spark,
      RunMediaAudit.parse(Seq("--in", s"$tmp/in", "--out", s"$tmp/out")))
    assert(report.modalities("image").rows === 0L)
    assert(report.unauditedRows === 3L && report.unauditedModalities === 2L)
    assert(report.unauditedTop === Seq("7" -> 2L, "9" -> 1L))
  }

  test("mixed-modality production stack: TrainPrep text survivors join media " +
      "survivors on doc id (VERDICT r12 next #6)") {
    // one corpus row per document, text + image payload side by side — the
    // two-CLI production recipe: RunTrainPrep curates the text column,
    // RunMediaAudit --pairs --dedup curates the image column, and the
    // trainer keeps the INTERSECTION on doc id (text-clean AND
    // visually-unique). Fixture plants one failure of each kind.
    def img(cls: Long) = Multimodal.PgmCodec.encode(16, 8, 255,
      Array.tabulate[Byte](128)(i => ((cls * (i + 1)) % 256).toByte))
    val tA = "the quick brown fox jumps over the lazy dog and runs to the green hills"
    val rows = Seq(
      Row(1L, tA, "image", img(10L)), // text dup of 2: min id survives
      Row(2L, tA, "image", img(20L)), // dropped by TEXT dedup
      Row(3L, "completely different prose about the spark engine and the shuffles it avoids",
        "image", img(30L)), // unique text, image dup of 4: min id survives
      Row(4L, "a third unique document that talks about the training data pipeline",
        "image", img(30L)), // dropped by MEDIA dedup
      Row(5L, "yet another unique body of text with the usual english marker words and more",
        "image", img(50L)), // kept on both sides
      Row(6L, "!!! ??? !!!", "image", img(60L))) // dropped by the quality gate
    val schema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val corpus = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixed").toString
    corpus.write.mode("overwrite").parquet(s"$tmp/in")

    // media half: the real CLI path, id-col pointed at the shared doc id
    val report = RunMediaAudit.execute(spark, RunMediaAudit.parse(Seq(
      "--in", s"$tmp/in", "--out", s"$tmp/out",
      "--id-col", "doc_id", "--pairs", "--dedup")))
    assert(report.modalities("image").survivors === 5L) // 4 lost to the pair (3,4)
    val mediaSurvivors = spark.read.parquet(s"$tmp/out/media_image_survivors")
      .withColumnRenamed("media_id", "doc_id")

    // text half: the TrainPrep pipeline over the same corpus's text column
    val textClean = graft.operators.TrainPrep
      .pipeline(corpus.select("doc_id", "text"), "doc_id", "text")
      .select("doc_id")
    assert(textClean.collect().map(_.getLong(0)).toSet === Set(1L, 3L, 4L, 5L))

    // the trainer's keep set: both curations agree on the shared id
    val kept = textClean.join(mediaSurvivors, Seq("doc_id"), "left_semi")
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L, 3L, 5L))
  }

  test("parse validates flag ranges and pair-tier preconditions") {
    intercept[IllegalArgumentException](RunMediaAudit.parse(Seq("--out", "x")))
    intercept[IllegalArgumentException](
      RunMediaAudit.parse(Seq("--in", "a", "--out", "b", "--ahash-size", "9")))
    intercept[IllegalArgumentException](
      RunMediaAudit.parse(Seq("--in", "a", "--out", "b", "--audio-frames", "63")))
    intercept[IllegalArgumentException](
      RunMediaAudit.parse(Seq("--in", "a", "--out", "b", "--bogus")))
    // --pairs preconditions fail at PARSE, not after the audit writes: a
    // sub-64-bit hash degenerates imageNearDupPairs' fixed band layout to
    // ~n²/2, and 4 must divide the audio fingerprint width
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--pairs", "--ahash-size", "6")))
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--pairs", "--audio-frames", "62")))
    // audit-only runs may use narrow hashes; pair runs with valid combos parse
    val narrow = RunMediaAudit.parse(Seq("--in", "a", "--out", "b", "--ahash-size", "6"))
    assert(!narrow.pairs && narrow.ahashSize === 6)
    val cfg = RunMediaAudit.parse(Seq("--in", "a", "--out", "b",
      "--pairs", "--audio-frames", "60", "--table", "t"))
    assert(cfg.pairs && cfg.audioFrames === 60 && cfg.table === "t")
    // guard and dedup are pair-tier features: they must fail at parse
    // without --pairs, and the bucket cap must be positive
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--max-bucket", "4")))
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--dedup")))
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--pairs", "--max-bucket", "0")))
    val g = RunMediaAudit.parse(Seq("--in", "a", "--out", "b",
      "--pairs", "--max-bucket", "64", "--dedup"))
    assert(g.maxBucket === Some(64) && g.dedup)
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--max-pixels", "0")))
    assert(RunMediaAudit.parse(Seq("--in", "a", "--out", "b",
      "--max-pixels", "1024")).maxPixels === 1024L)
    // frame-sampling knobs (the videoFingerprint cost-ceiling contract)
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--frame-stride", "0")))
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--max-frames", "0")))
    val fs = RunMediaAudit.parse(Seq("--in", "a", "--out", "b",
      "--frame-stride", "5", "--max-frames", "100"))
    assert(fs.frameStride === 5 && fs.maxFrames === 100)
    // the clean-docs tail consumes the dedup survivor tables: it must fail
    // at parse without --dedup, not after the audits are written
    intercept[IllegalArgumentException](RunMediaAudit.parse(
      Seq("--in", "a", "--out", "b", "--pairs", "--text-survivors", "t")))
    val ts = RunMediaAudit.parse(Seq("--in", "a", "--out", "b", "--pairs",
      "--dedup", "--text-survivors", "t", "--text-id-col", "k"))
    assert(ts.textSurvivors === Some("t") && ts.textIdCol === "k")
  }

  test("--text-survivors: the one-invocation mixed-modality clean corpus " +
      "equals the two-CLI recipe's hand join (VERDICT r13 next #6)") {
    // same fixture shape as the composition spec above: text dup (1,2),
    // image dup (3,4), quality-gate failure (6) — plus doc 7, which has NO
    // media row at all and must ride through the media tail untouched
    def img(cls: Long) = Multimodal.PgmCodec.encode(16, 8, 255,
      Array.tabulate[Byte](128)(i => ((cls * (i + 1)) % 256).toByte))
    val tA = "the quick brown fox jumps over the lazy dog and runs to the green hills"
    val textRows = Seq(
      Row(1L, tA),
      Row(2L, tA),
      Row(3L, "completely different prose about the spark engine and the shuffles it avoids"),
      Row(4L, "a third unique document that talks about the training data pipeline"),
      Row(5L, "yet another unique body of text with the usual english marker words and more"),
      Row(6L, "!!! ??? !!!"),
      Row(7L, "a text only document with no media asset attached to its doc id at all"))
    val mediaRows = Seq(
      Row(1L, "image", img(10L)), Row(2L, "image", img(20L)),
      Row(3L, "image", img(30L)), Row(4L, "image", img(30L)),
      Row(5L, "image", img(50L)), Row(6L, "image", img(60L)))
    val textSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("text", StringType, nullable = false)))
    val mediaSchema = StructType(Seq(
      StructField("doc_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val text = spark.createDataFrame(spark.sparkContext.parallelize(textRows, 2), textSchema)
    val media = spark.createDataFrame(spark.sparkContext.parallelize(mediaRows, 2), mediaSchema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-mixed-cli").toString
    media.write.mode("overwrite").parquet(s"$tmp/media")

    // invocation 1: the text CLI writes the clean corpus
    graft.operators.TrainPrep.pipeline(text, "doc_id", "text")
      .write.mode("overwrite").parquet(s"$tmp/text_clean")
    val textIds = spark.read.parquet(s"$tmp/text_clean")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(textIds === Set(1L, 3L, 4L, 5L, 7L))

    // invocation 2: media audit + dedup + the clean-docs tail, in ONE run
    val report = RunMediaAudit.execute(spark, RunMediaAudit.parse(Seq(
      "--in", s"$tmp/media", "--out", s"$tmp/out", "--id-col", "doc_id",
      "--pairs", "--dedup", "--text-survivors", s"$tmp/text_clean")))
    assert(report.cleanDocs === 4L)
    val clean = spark.read.parquet(s"$tmp/out/media_clean_docs")
    // doc 4's image is a dup of doc 3's (min id survives); doc 7 has no
    // media and survives; the schema is the text table's, rows intact
    assert(clean.columns.toSet === spark.read.parquet(s"$tmp/text_clean").columns.toSet)
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === Set(1L, 3L, 5L, 7L))

    // identity vs the two-invocation recipe: hand-join the survivor tables
    // exactly as the r12 composition spec did
    val mediaSurvivors = spark.read.parquet(s"$tmp/out/media_image_survivors")
      .withColumnRenamed("media_id", "doc_id")
    val pairedIds = spark.read.parquet(s"$tmp/out/media_image_pairs")
    val removedManual = pairedIds.select(col("id1").as("doc_id"))
      .unionByName(pairedIds.select(col("id2").as("doc_id"))).distinct()
      .join(mediaSurvivors, Seq("doc_id"), "left_anti")
      .collect().map(_.getLong(0)).toSet
    val keptManual = textIds -- removedManual
    assert(clean.select("doc_id").collect().map(_.getLong(0)).toSet === keptManual)
  }

  test("--max-pixels caps the image decode: over-cap rasters count as " +
      "undecodable instead of OOM-killing the partition") {
    def gray(id: Long) = Array.tabulate[Byte](128)(i => ((id * (i + 1)) % 256).toByte)
    val rows = Seq(
      Row(1L, "image", Multimodal.PngCodec.encode(16, 8, gray(1L))), // 128 px
      Row(2L, "image", Multimodal.PngCodec.encode(16, 8, gray(2L))),
      Row(3L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(3L)))) // un-capped
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-px").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")
    val report = RunMediaAudit.execute(spark, RunMediaAudit.parse(Seq(
      "--in", s"$tmp/in", "--out", s"$tmp/out", "--max-pixels", "100")))
    assert(report.modalities("image") === RunMediaAudit.ModalityReport(3L, 2L, -1L))
  }

  test("--sem-dedup: SemDeDup as a fourth media dedup geometry — CLI " +
      "survivors ≡ the operator over the fingerprint-bit embedding " +
      "(VERDICT r14 next #6)") {
    import org.apache.spark.sql.functions.expr
    def gray(id: Long) = Array.tabulate[Byte](128)(i => ((id * (i + 1)) % 256).toByte)
    def wav(id: Long) = Multimodal.WavCodec.encode(8000, 1,
      Array.tabulate[Short](160)(i => ((id * (i + 3)) % 256).toShort))
    // 6 image replicas + 2 distinct; 4 audio replicas + 2 distinct: exact
    // replicas share a fingerprint, so the ±1 embedding pairs them at
    // cos = 1 regardless of learned centroids (the semDedupAuto spec rule)
    val rows =
      (1L to 6L).map(id => Row(id, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(500L)))) ++
      Seq(Row(7L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(7L))),
        Row(8L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(8L)))) ++
      (21L to 24L).map(id => Row(id, "audio", wav(700L))) ++
      Seq(Row(25L, "audio", wav(25L)), Row(26L, "audio", wav(26L)))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-sem").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")

    // no --pairs needed: the sem tier reads only the audit tables
    val report = RunMediaAudit.execute(spark, RunMediaAudit.parse(Seq(
      "--in", s"$tmp/in", "--out", s"$tmp/out", "--sem-dedup", "0.8")))

    // identity vs the operator call on the same derived vectors
    val bitVec = expr(
      "concat(transform(sequence(0, 31), i -> CAST(IF(((ahash_lo >> i) & 1) = 1, 1.0, -1.0) AS FLOAT))," +
        " transform(sequence(0, 31), i -> CAST(IF(((ahash_hi >> i) & 1) = 1, 1.0, -1.0) AS FLOAT)))")
    val audit = spark.read.parquet(s"$tmp/out/media_image_audit")
    val expect = graft.operators.Dedup.semDedupAuto(
        audit.filter(col("ahash_hi").isNotNull && col("ahash_lo").isNotNull)
          .select(col("media_id"), bitVec.as("__vec")),
        "media_id", "__vec", 0.8)
      .collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(s"$tmp/out/media_image_sem_survivors")
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    // the replica cluster collapses to ONE survivor; distinct images ride
    assert(got.size === 3 && got.contains(7L) && got.contains(8L))
    assert(report.modalities("image").semSurvivors === 3L)
    // audio: 4 replicas → 1 survivor + 2 distinct
    val aud = spark.read.parquet(s"$tmp/out/media_audio_sem_survivors")
      .collect().map(_.getLong(0)).toSet
    assert(aud.size === 3 && aud.contains(25L) && aud.contains(26L))
    assert(report.modalities("audio").semSurvivors === 3L)
    // pairs/dedup not armed: their report slots stay -1, sem stands alone
    assert(report.modalities("image").pairs === -1L)
    assert(report.modalities("image").survivors === -1L)
    // threshold is validated as a cosine at parse
    intercept[IllegalArgumentException](RunMediaAudit.parse(Seq(
      "--in", "a", "--out", "b", "--sem-dedup", "1.5")))
  }

  test("--sem-dedup embeds the ahash's REAL bit width: --ahash-size 4 " +
      "uses 16 coordinates, not 64 with constant padding") {
    import org.apache.spark.sql.functions.expr
    def gray(id: Long) = Array.tabulate[Byte](128)(i => ((id * (i + 1)) % 256).toByte)
    val rows =
      (1L to 4L).map(id => Row(id, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(300L)))) ++
      Seq(Row(5L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(5L))),
        Row(6L, "image", Multimodal.PgmCodec.encode(16, 8, 255, gray(6L))))
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true)))
    val media = spark.createDataFrame(spark.sparkContext.parallelize(rows, 2), schema)
    val tmp = java.nio.file.Files.createTempDirectory("graft-media-sem4").toString
    media.write.mode("overwrite").parquet(s"$tmp/in")
    // narrow hashes are pair-tier-forbidden (--pairs requires size 8) but
    // sem-dedup legitimately runs on them — with a 16-coordinate embedding
    val report = RunMediaAudit.execute(spark, RunMediaAudit.parse(Seq(
      "--in", s"$tmp/in", "--out", s"$tmp/out",
      "--ahash-size", "4", "--sem-dedup", "0.8")))
    val bitVec16 = expr(
      "transform(sequence(0, 15), i -> CAST(IF(((ahash_lo >> i) & 1) = 1, 1.0, -1.0) AS FLOAT))")
    val audit = spark.read.parquet(s"$tmp/out/media_image_audit")
    val expect = graft.operators.Dedup.semDedupAuto(
        audit.filter(col("ahash_hi").isNotNull && col("ahash_lo").isNotNull)
          .select(col("media_id"), bitVec16.as("__vec")),
        "media_id", "__vec", 0.8)
      .collect().map(_.getLong(0)).toSet
    val got = spark.read.parquet(s"$tmp/out/media_image_sem_survivors")
      .collect().map(_.getLong(0)).toSet
    assert(got === expect)
    assert(report.modalities("image").semSurvivors === expect.size.toLong)
  }
}
