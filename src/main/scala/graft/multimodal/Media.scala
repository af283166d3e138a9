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

  // ROOT CAUSE of the r14/r15 bench-context decode inflation (r16, r15
  // verdict #2): with ImageIO's default useCache=true,
  // createImageInputStream — called internally by EVERY ImageIO.read —
  // wraps even a ByteArrayInputStream in a FileCacheImageInputStream,
  // i.e. writes each image's bytes to a java.io.tmpdir TEMP FILE before
  // decoding (jshell-verified: stream class flips to
  // MemoryCacheImageInputStream with the flag off). Decode latency
  // therefore tracked tmp-disk/page-cache state, which a ~90-query bench
  // prefix (GBs of checkpoint/shuffle writes) perturbs — exactly the
  // observed profile: follows any heavy prefix, decays with repeats (the
  // cache warms), heap-insensitive. The payloads are ALREADY byte arrays
  // in memory; disk-backing their streams is pure pathology here.
  //
  // CAVEAT (r16 ADVICE): ImageIO.setUseCache is JVM-GLOBAL — it also
  // flips behavior for any unrelated ImageIO user sharing the executor
  // JVM (acceptable here: it only moves stream buffering from a temp
  // file to heap, never changes decoded bytes). And a static-initializer
  // side effect alone would make the executor-side application depend on
  // the Media$ module classloading before the first decode — an ordering
  // that holds today only because every decode closure calls back into
  // this object. Each mapPartitions decode closure therefore ALSO calls
  // [[disableStreamDiskCache]] explicitly (idempotent, nanoseconds), so
  // the fix is structural, not an accident of classload order.
  private[multimodal] def disableStreamDiskCache(): Unit =
    javax.imageio.ImageIO.setUseCache(false)
  disableStreamDiskCache() // driver + any same-JVM embedder, up front

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
        disableStreamDiskCache() // structural, not classload-ordered
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

  /** Handcrafted w×h 24-bit BMP (BITMAPINFOHEADER, bottom-up rows padded
    * to 4 bytes, deterministic gradient pixels) — a literal image payload
    * for oracle-checked queries and specs that must not depend on any
    * encoder's byte choices. */
  def tinyBmp(w: Int, h: Int): Array[Byte] = {
    require(w > 0 && h > 0, "bmp dims must be positive")
    val rowSize = ((w * 3 + 3) / 4) * 4
    val size = 54 + rowSize * h
    val b = java.nio.ByteBuffer.allocate(size).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    b.put('B'.toByte).put('M'.toByte).putInt(size)
      .putShort(0).putShort(0).putInt(54) // reserved + pixel-data offset
    b.putInt(40).putInt(w).putInt(h).putShort(1).putShort(24) // INFOHEADER
      .putInt(0).putInt(rowSize * h).putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        b.put(((x * 40 + y) % 256).toByte).put(((y * 40 + x) % 256).toByte)
          .put(((x + y) * 20 % 256).toByte)
        x += 1
      }
      var p = w * 3
      while (p < rowSize) { b.put(0.toByte); p += 1 }
      y += 1
    }
    b.array()
  }

  /** Full raster decode — unlike [[imageDimensions]] this reads the pixels
    * (still streaming: one image in memory per row); PNG/BMP/GIF are
    * lossless, so the ARGB values are bit-exact across JVMs. */
  def decodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] = {
    if (bytes == null || bytes.length == 0) return None
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: java.io.IOException => None }
  }

  val featureSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("n_bytes", IntegerType),
    StructField("width", IntegerType),
    StructField("height", IntegerType),
    StructField("mean_r", DoubleType),
    StructField("mean_g", DoubleType),
    StructField("mean_b", DoubleType),
    StructField("decoded", BooleanType),
  ))

  /** Per-image channel statistics — the feature-extraction stage of a
    * multimodal pipeline (the downstream consumer is an embedding model or
    * a quality filter keyed on such features). Images get REAL per-channel
    * means over the decoded raster, rounded to 4 dp (exact: lossless
    * formats decode bit-identically). Non-image payloads take a
    * deterministic FAKE derived from the byte length (documented formula —
    * the catalog oracle mirrors it), `decoded = false`. */
  def extractFeatures(df: DataFrame, idCol: String, blobCol: String): DataFrame = {
    val spark = df.sparkSession
    def r4(x: Double): Double = math.rint(x * 10000.0) / 10000.0
    val rdd = df.select(col(idCol).cast("long"), col(blobCol).cast("binary")).rdd
      .mapPartitions { it =>
        disableStreamDiskCache() // structural, not classload-ordered
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0 else bytes.length
          decodeImage(bytes) match {
            case Some(img) =>
              val (w, h) = (img.getWidth, img.getHeight)
              var sr = 0L; var sg = 0L; var sb = 0L
              var y = 0
              while (y < h) {
                var x = 0
                while (x < w) {
                  val p = img.getRGB(x, y)
                  sr += (p >> 16) & 0xff; sg += (p >> 8) & 0xff; sb += p & 0xff
                  x += 1
                }
                y += 1
              }
              val px = w.toLong * h
              Row(id, n, w, h, r4(sr.toDouble / px), r4(sg.toDouble / px),
                r4(sb.toDouble / px), true)
            // FAKE branch (non-image payloads only): deterministic from
            // length. Long arithmetic — the oracle computes the same
            // formula exact, and n * 131 overflows Int past ~16 MB blobs.
            case None => Row(id, n, 16 + n % 241, 16 + (n / 241) % 241,
              (n.toLong % 256).toDouble, (n.toLong * 31 % 256).toDouble,
              (n.toLong * 131 % 256).toDouble, false)
          }
        }
      }
    spark.createDataFrame(rdd, featureSchema)
  }

  val resizeSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("out_width", IntegerType),
    StructField("out_height", IntegerType),
    StructField("pixel_sum", LongType),
    StructField("resized_png", BinaryType),
    StructField("decoded", BooleanType),
  ))

  /** Nearest-neighbor resize to (tw × th) — implemented directly on the
    * raster (source pixel (x·sw/tw, y·sh/th)), NOT via Graphics2D, so the
    * resampling is bit-deterministic across JVMs. Emits the re-encoded PNG
    * bytes (the real pipeline payload) plus `pixel_sum` — the Σ(r+g+b) of
    * the resized raster — as the engine-portable digest the oracle can pin
    * (PNG encoder bytes are not stable across JVM versions; the raster
    * is). Non-image payloads keep a deterministic FAKE digest from the
    * byte length (mirrored by the catalog oracle) and a null payload. */
  def resizeNearest(df: DataFrame, idCol: String, blobCol: String,
      tw: Int, th: Int): DataFrame = {
    require(tw > 0 && th > 0, "target dimensions must be positive")
    val spark = df.sparkSession
    val rdd = df.select(col(idCol).cast("long"), col(blobCol).cast("binary")).rdd
      .mapPartitions { it =>
        disableStreamDiskCache() // structural, not classload-ordered
        it.map { r =>
          val id = r.getLong(0)
          val bytes = r.getAs[Array[Byte]](1)
          val n = if (bytes == null) 0 else bytes.length
          decodeImage(bytes) match {
            case Some(img) =>
              val (sw, sh) = (img.getWidth, img.getHeight)
              val out = new java.awt.image.BufferedImage(tw, th,
                java.awt.image.BufferedImage.TYPE_INT_RGB)
              var sum = 0L
              var y = 0
              while (y < th) {
                val sy = (y.toLong * sh / th).toInt
                var x = 0
                while (x < tw) {
                  val sx = (x.toLong * sw / tw).toInt
                  val p = img.getRGB(sx, sy)
                  out.setRGB(x, y, p)
                  sum += ((p >> 16) & 0xff) + ((p >> 8) & 0xff) + (p & 0xff)
                  x += 1
                }
                y += 1
              }
              val bos = new java.io.ByteArrayOutputStream()
              javax.imageio.ImageIO.write(out, "png", bos)
              Row(id, tw, th, sum, bos.toByteArray, true)
            // FAKE branch (non-image payloads only): deterministic from length.
            case None =>
              Row(id, tw, th, n.toLong * 2654435761L % 1000000007L, null, false)
          }
        }
      }
    spark.createDataFrame(rdd, resizeSchema)
  }
}
