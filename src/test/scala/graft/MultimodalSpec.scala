package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.operators.Multimodal

/** Multimodal plumbing: schema contract, row-preserving feature extraction,
  * exploding frame sampling, and blob-pruning stats — with the stub codec.
  */
class MultimodalSpec extends SparkSpecBase {

  private def media() = {
    val rows = Seq(
      Row(1L, "image", Array.tabulate[Byte](100)(_.toByte), Row("image/png", 8, 8, null)),
      Row(2L, "video", Array.tabulate[Byte](200)(i => (i * 3).toByte),
        Row("video/mp4", 16, 16, 5000L)),
      Row(3L, "audio", null, Row("audio/mp3", null, null, 1200L)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
  }

  test("extractFeatures: row-preserving, deterministic, typed output") {
    val out = Multimodal.extractFeatures(media(), dim = 4).orderBy("media_id").collect()
    assert(out.length === 3)
    assert(out(0).getAs[Long]("n_bytes") === 100L)
    assert(out(2).getAs[Long]("n_bytes") === 0L) // null blob tolerated
    val f1 = out(0).getSeq[Float](out(0).fieldIndex("feature"))
    assert(f1.length === 4)
    val again = Multimodal.extractFeatures(media(), dim = 4).orderBy("media_id").collect()
    assert(again(0).getSeq[Float](again(0).fieldIndex("feature")) === f1)
  }

  test("sampleFrames: explodes after decode, null blobs produce no frames") {
    val out = Multimodal.sampleFrames(media(), everyMs = 500L).collect()
    // 100B/64 -> 2 frames, 200B/64 -> 4 frames, null -> 0
    assert(out.count(_.getLong(0) == 1L) === 2)
    assert(out.count(_.getLong(0) == 2L) === 4)
    assert(out.count(_.getLong(0) == 3L) === 0)
    val frameMs = out.filter(_.getLong(0) == 2L).map(_.getLong(1)).sorted
    assert(frameMs.toSeq === Seq(0L, 500L, 1000L, 1500L))
  }

  test("extracted features feed the embedding dedup tier unchanged") {
    // two assets with identical bytes + one different: the stub features go
    // straight into embeddingNearDupPairs — same Array[Float] contract as
    // the embeddings table, so the multimodal and ANN tiers compose
    val rows = Seq(
      Row(1L, "image", Array.tabulate[Byte](100)(_.toByte), null),
      Row(2L, "image", Array.tabulate[Byte](100)(_.toByte), null),
      Row(3L, "image", Array.tabulate[Byte](100)(i => (i * 7 + 1).toByte), null))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), Multimodal.MediaSchema)
    val feats = Multimodal.extractFeatures(df, dim = 8)
    val pairs = graft.operators.Dedup
      .embeddingNearDupPairs(feats, "media_id", "feature", signBits = 2, threshold = 0.999)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.contains((1L, 3L)) && !pairs.contains((2L, 3L)))
  }

  test("mediaStats never touches the blob column (pruned scan)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-media").toString
    media().write.mode("overwrite").parquet(tmp)
    val stats = Multimodal.mediaStats(spark.read.parquet(tmp))
    val plan = stats.queryExecution.executedPlan.toString
    assert(!plan.contains("content"), "blob column must be pruned from the scan")
    assert(stats.collect().length === 3)
  }
}
