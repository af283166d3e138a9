package graft.multimodal

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Multimodal-column machinery: image/audio/video payloads are opaque
  * `binary` columns with typed metadata structs, decoded partition-wise.
  *
  * Image decode is REAL — `javax.imageio` ships with the JDK and reads
  * PNG/BMP/GIF/JPEG, so width/height come from actually parsing the bytes.
  * Non-image payloads (audio/video codecs are not in the JDK) fall back to
  * a deterministic fake derived from the byte length, clearly marked below —
  * the batching/schema contract is identical either way, so swapping in an
  * ffmpeg-backed decoder touches only the per-row function.
  */
object Media {

  /** Deterministic fake "decoded width" for non-image payloads (matches the
    * decodeMeta fallback). */
  def fakeWidth(blob: Column): Column =
    lit(16) + octet_length(blob) % 241

  /** Deterministic fake "decoded height" for non-image payloads. */
  def fakeHeight(blob: Column): Column =
    lit(16) + (octet_length(blob) / 241).cast("int") % 241

  val mediaMetaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("n_frames", IntegerType),
    StructField("decoded", BooleanType),
  ))

  /** Real image decode: dimensions straight from the stream header via the
    * JDK's ImageIO reader plugins (PNG/BMP/GIF/JPEG) — header-only, no full
    * raster decode, so it streams at pipeline rates. None when the bytes are
    * not a supported image. */
  def imageDimensions(bytes: Array[Byte]): Option[(Int, Int)] = {
    if (bytes == null || bytes.length == 0) return None
    val in = javax.imageio.ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes))
    try {
      val readers = javax.imageio.ImageIO.getImageReaders(in)
      if (!readers.hasNext) None
      else {
        val reader = readers.next()
        try {
          reader.setInput(in)
          Some((reader.getWidth(0), reader.getHeight(0)))
        } catch {
          case _: java.io.IOException => None
        } finally reader.dispose()
      }
    } finally in.close()
  }

  /** Partition-wise decode — the real-world shape for a media pipeline:
    * one decoder pass per partition, streaming rows through it. Images are
    * genuinely decoded (see imageDimensions); other payloads keep the
    * FAKE length-derived metadata with `decoded = false`. */
  def decodeMeta(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(blobCol).cast("binary")).rdd
      .mapPartitions { it =>
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0 else bytes.length
          imageDimensions(bytes) match {
            case Some((w, h)) => Row(id, n, w, h, 1, true)
            // FAKE branch (non-image payloads only): deterministic from length.
            case None => Row(id, n, 16 + n % 241, 16 + (n / 241) % 241, 1 + n % 32, false)
          }
        }
      }
    spark.createDataFrame(rdd, mediaMetaSchema)
  }

  /** Deterministic frame sampling over the decoded metadata: every k-th
    * frame index — the explode-style fan-out a frame sampler needs. */
  def sampleFrames(df: DataFrame, idCol: String, blobCol: String, everyK: Int): DataFrame =
    decodeMeta(df, idCol, blobCol)
      .select(col("doc_id"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(everyK))).as("frame_idx"))
}
