package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal columns for training-data pipelines: image/audio/video travel
  * as opaque `binary` columns with typed metadata structs; decode /
  * feature-extract / resize / frame-sample run as partition-local batch
  * functions (`mapPartitions` — the JVM analogue of arrow-batched UDFs).
  *
  * The actual codecs are NOT in this environment, so the decode step is a
  * clearly-marked deterministic STUB ([[StubCodec]]) behind the same
  * interface a real decoder (javacv / ffmpeg bindings) would implement; the
  * Spark-side plumbing — schema contract, batch shape, partition-local
  * reuse of a (normally expensive) codec handle, row-count-preserving and
  * exploding variants — is real and tested.
  *
  * Scale notes: media blobs must NEVER be shuffled — all per-asset work is
  * map-side; `repartition` happens on metadata before the blobs are
  * attached, and frame explosion multiplies rows AFTER the narrow decode so
  * Spark can spill row-by-row.
  */
object Multimodal {

  /** Schema contract for a media table: id + opaque payload + typed metadata. */
  val MediaSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false), // image | audio | video
    StructField("content", BinaryType, nullable = true),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType, nullable = true),
      StructField("width", IntegerType, nullable = true),
      StructField("height", IntegerType, nullable = true),
      StructField("duration_ms", LongType, nullable = true))), nullable = true)))

  val FeatureSchema: StructType = StructType(Seq(
    StructField("media_id", LongType, nullable = false),
    StructField("modality", StringType, nullable = false),
    StructField("n_bytes", LongType, nullable = false),
    StructField("feature", ArrayType(FloatType, containsNull = false), nullable = false)))

  /** A codec handle is expensive to create (native contexts, model weights)
    * — the mapPartitions plumbing instantiates ONE per partition and reuses
    * it across the partition's rows.
    */
  trait Codec extends Serializable {
    def features(modality: String, content: Array[Byte], dim: Int): Array[Float]
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])]
  }

  /** Deterministic stand-in for the real decoder: features are a seeded
    * byte-histogram projection, frames are fixed-size slices. Replace with a
    * javacv/ffmpeg-backed Codec in a full environment — the operator code
    * below does not change.
    */
  object StubCodec extends Codec {
    def features(modality: String, content: Array[Byte], dim: Int): Array[Float] = {
      val out = new Array[Float](dim)
      if (content != null) {
        var i = 0
        while (i < content.length) {
          out(i % dim) += (content(i) & 0xff) / 255.0f
          i += 1
        }
      }
      out
    }
    def frames(content: Array[Byte], everyMs: Long): Iterator[(Long, Array[Byte])] =
      if (content == null) Iterator.empty
      else content.grouped(64).zipWithIndex.map { case (chunk, i) => (i * everyMs, chunk) }
  }

  /** Row-preserving feature extraction: one feature vector per asset.
    * Partition-local codec handle; output is columnar-friendly (no blobs).
    */
  def extractFeatures(
      media: DataFrame,
      dim: Int = 16,
      codec: Codec = StubCodec): DataFrame = {
    val spark = media.sparkSession
    val enc = org.apache.spark.sql.Encoders.row(FeatureSchema)
    media.select("media_id", "modality", "content").mapPartitions { rows =>
      val c = codec // one handle per partition
      rows.map { r =>
        val content = r.getAs[Array[Byte]]("content")
        Row(r.getAs[Long]("media_id"), r.getAs[String]("modality"),
          if (content == null) 0L else content.length.toLong,
          c.features(r.getAs[String]("modality"), content, dim))
      }
    }(enc)
  }

  /** Exploding frame-sampler: video/audio rows fan out to one row per
    * sampled frame AFTER the narrow decode (no blob shuffle).
    */
  def sampleFrames(
      media: DataFrame,
      everyMs: Long = 1000L,
      codec: Codec = StubCodec): DataFrame = {
    val schema = StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("frame_ms", LongType, nullable = false),
      StructField("frame", BinaryType, nullable = true)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    media.select("media_id", "content").mapPartitions { rows =>
      val c = codec
      rows.flatMap { r =>
        c.frames(r.getAs[Array[Byte]]("content"), everyMs).map { case (ms, bytes) =>
          Row(r.getAs[Long]("media_id"), ms, bytes)
        }
      }
    }(enc)
  }

  /** Metadata-only projection — the common fast path: prune the blob column
    * at the scan so a stats query never reads media bytes (column pruning
    * reaches the parquet reader; verify via ReadSchema in `.explain`).
    */
  def mediaStats(media: DataFrame): DataFrame =
    media.select(col("media_id"), col("modality"),
        col("meta.mime").as("mime"), col("meta.width").as("width"),
        col("meta.height").as("height"), col("meta.duration_ms").as("duration_ms"))
      .groupBy("modality", "mime")
      .agg(count(lit(1)).as("n"), avg(col("duration_ms")).as("avg_duration_ms"))
}
