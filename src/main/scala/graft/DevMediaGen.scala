package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Dev harness: materialize the q79/q81/q83 media fixtures as a REAL
  * media parquet (`runMain graft.DevMediaGen <sfDir> <outPath>`) so the
  * production CLI ([[RunMediaAudit]]) can be driven end-to-end at the
  * big scale rungs — one image + one audio + one video row per document,
  * the exact syntheses the oracle queries pin (PNG pixel i =
  * (id·(i+1)) mod 256 at 16×8; 160-sample PCM16 clip, sample i =
  * (id·(i+3)) mod 256; 4-frame P5 clip, frame f pixel i =
  * (id·(i+1)+17·f) mod 256), so the survivor sets have closed-form
  * class structure an independent checker can recompute
  * (dev/media_stack_check.py).
  */
object DevMediaGen {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, outPath) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val enc = org.apache.spark.sql.Encoders.row(StructType(Seq(
      StructField("media_id", LongType, nullable = false),
      StructField("modality", StringType, nullable = false),
      StructField("content", BinaryType, nullable = true))))
    import graft.operators.Multimodal
    spark.read.parquet(s"$sfDir/documents.parquet").select(col("doc_id"))
      .mapPartitions { rows =>
        rows.flatMap { r =>
          val id = r.getLong(0)
          val px = Array.tabulate[Byte](16 * 8)(i => ((id * (i + 1)) % 256).toByte)
          val samples = Array.tabulate[Short](160)(i => ((id * (i + 3)) % 256).toShort)
          val clip = (0 until 4).toArray.flatMap { f =>
            Multimodal.PgmCodec.encode(16, 8, 255,
              Array.tabulate[Byte](16 * 8)(i => ((id * (i + 1) + 17 * f) % 256).toByte))
          }
          Seq(
            Row(id, "image", Multimodal.PngCodec.encode(16, 8, px)),
            Row(id, "audio", Multimodal.WavCodec.encode(8000, 1, samples)),
            Row(id, "video", clip))
        }
      }(enc)
      .write.mode("overwrite").parquet(outPath)
    println(s"[media-gen] wrote $outPath")
    spark.stop()
  }
}
