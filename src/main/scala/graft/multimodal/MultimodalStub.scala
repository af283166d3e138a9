package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column plumbing: image/audio/video payloads are opaque
  * `binary` columns with typed metadata structs. The Spark-side machinery
  * (schema, partition-wise batching, mapPartitions signature) is real and
  * tested; the actual media decode is a STUB — this container has no
  * image/audio libraries — replaced by a deterministic fake derived from the
  * bytes, clearly marked below.
  */
object MultimodalStub {

  /** Deterministic fake "decoded width" — STUB for a real image decoder. */
  def fakeWidth(blob: Column): Column =
    lit(16) + octet_length(blob) % 241

  /** Deterministic fake "decoded height" — STUB for a real image decoder. */
  def fakeHeight(blob: Column): Column =
    lit(16) + (octet_length(blob) / 241).cast("int") % 241

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
  ))

  /** Partition-wise "decode": the real-world shape for a media pipeline —
    * one decoder instance per partition, streaming rows through it. The
    * decode itself (???-grade) is faked deterministically from byte length,
    * but the batching/schema contract is exactly what a libjpeg/ffmpeg-backed
    * implementation would use.
    */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(blobCol).cast("binary")).rdd
      .mapPartitions { it =>
        // STUB: a real implementation would initialize the native decoder
        // here, once per partition, and close it at iterator end.
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0 else bytes.length
          Row(id, n, 16 + n % 241, 16 + (n / 241) % 241, 1 + n % 32)
        }
      }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** Deterministic frame sampling over a fake "video": every k-th frame
    * index — demonstrates the explode-style fan-out a frame sampler needs. */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, everyK: Int): DataFrame =
    decodeMeta(df, idCol, blobCol)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
