package graft

import graft.multimodal.Media

class MediaSpec extends SparkSpec {
  import spark.implicits._

  private def fixtureBytes(name: String): Array[Byte] = {
    val in = getClass.getResourceAsStream(name)
    try in.readAllBytes() finally in.close()
  }

  test("decodeMeta really decodes a PNG fixture's dimensions") {
    val png = fixtureBytes("/fixtures/graft-20x7.png")
    val df = Seq((1L, png)).toDF("doc_id", "blob")
    val row = Media.decodeMeta(df, "doc_id", "blob").collect().head
    assert(row.getAs[Int]("width") == 20)
    assert(row.getAs[Int]("height") == 7)
    assert(row.getAs[Int]("n_bytes") == png.length)
    assert(row.getAs[Boolean]("decoded"))
  }

  test("decodeMeta decodes a generated BMP and falls back on non-image bytes") {
    // BMP written by the JDK's own encoder — a second real format.
    val img = new java.awt.image.BufferedImage(33, 12,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    val bmp = bos.toByteArray
    val junk = "not an image at all".getBytes("UTF-8")
    val df = Seq((1L, bmp), (2L, junk)).toDF("doc_id", "blob")
    val rows = Media.decodeMeta(df, "doc_id", "blob")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Int]("width") == 33)
    assert(rows(1L).getAs[Int]("height") == 12)
    assert(rows(1L).getAs[Boolean]("decoded"))
    // fallback keeps the documented deterministic fake
    val n = junk.length
    assert(!rows(2L).getAs[Boolean]("decoded"))
    assert(rows(2L).getAs[Int]("width") == 16 + n % 241)
    assert(rows(2L).getAs[Int]("height") == 16 + (n / 241) % 241)
  }

  test("fakeWidth/fakeHeight columns match the decodeMeta fallback") {
    val junk = "xyzzy".getBytes("UTF-8")
    val df = Seq((7L, junk)).toDF("doc_id", "blob")
    val viaCols = df.select(
      Media.fakeWidth(org.apache.spark.sql.functions.col("blob")).as("w"),
      Media.fakeHeight(org.apache.spark.sql.functions.col("blob")).as("h"))
      .collect().head
    val viaDecode = Media.decodeMeta(df, "doc_id", "blob").collect().head
    assert(viaCols.getAs[Int]("w") == viaDecode.getAs[Int]("width"))
    assert(viaCols.getAs[Int]("h") == viaDecode.getAs[Int]("height"))
  }

  /** 2×2 BMP with per-pixel values chosen to discriminate the channels. */
  private def quadBmp(): Array[Byte] = {
    val img = new java.awt.image.BufferedImage(2, 2,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    img.setRGB(0, 0, (10 << 16) | (20 << 8) | 30)
    img.setRGB(1, 0, (50 << 16) | (60 << 8) | 70)
    img.setRGB(0, 1, (90 << 16) | (100 << 8) | 110)
    img.setRGB(1, 1, (130 << 16) | (140 << 8) | 150)
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, "bmp", bos)
    bos.toByteArray
  }

  test("extractFeatures: real channel means for images, formula fallback") {
    val junk = "not an image".getBytes("UTF-8")
    val df = Seq((1L, quadBmp()), (2L, junk)).toDF("doc_id", "blob")
    val rows = Media.extractFeatures(df, "doc_id", "blob")
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(rows(1L).getAs[Boolean]("decoded"))
    assert(rows(1L).getAs[Int]("width") == 2 && rows(1L).getAs[Int]("height") == 2)
    assert(rows(1L).getAs[Double]("mean_r") == 70.0) // (10+50+90+130)/4
    assert(rows(1L).getAs[Double]("mean_g") == 80.0)
    assert(rows(1L).getAs[Double]("mean_b") == 90.0)
    val n = junk.length
    assert(!rows(2L).getAs[Boolean]("decoded"))
    assert(rows(2L).getAs[Double]("mean_r") == (n % 256).toDouble)
    assert(rows(2L).getAs[Double]("mean_g") == (n * 31 % 256).toDouble)
    assert(rows(2L).getAs[Double]("mean_b") == (n * 131 % 256).toDouble)
  }

  test("resizeNearest: deterministic raster resample with a decodable payload") {
    val junk = "still not an image".getBytes("UTF-8")
    val df = Seq((1L, quadBmp()), (2L, junk)).toDF("doc_id", "blob")
    val rows = Media.resizeNearest(df, "doc_id", "blob", tw = 4, th = 4)
      .collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    val img = rows(1L)
    assert(img.getAs[Boolean]("decoded"))
    assert(img.getAs[Int]("out_width") == 4 && img.getAs[Int]("out_height") == 4)
    // nearest-neighbor upscale 2x2 -> 4x4 repeats each pixel 2x2:
    // sum = 4 * ((10+20+30)+(50+60+70)+(90+100+110)+(130+140+150)) = 3840
    assert(img.getAs[Long]("pixel_sum") == 3840L)
    // the emitted PNG payload is a real image that round-trips
    val png = img.getAs[Array[Byte]]("resized_png")
    val back = Media.decodeImage(png).get
    assert(back.getWidth == 4 && back.getHeight == 4)
    assert((back.getRGB(0, 0) & 0xffffff) == ((10 << 16) | (20 << 8) | 30))
    assert((back.getRGB(3, 3) & 0xffffff) == ((130 << 16) | (140 << 8) | 150))
    val n = junk.length
    assert(!rows(2L).getAs[Boolean]("decoded"))
    assert(rows(2L).getAs[Long]("pixel_sum") == n.toLong * 2654435761L % 1000000007L)
    assert(rows(2L).isNullAt(rows(2L).fieldIndex("resized_png")))
  }

  test("image_dims expression parses PNG/BMP/JPEG headers and nulls junk") {
    import graft.functions.expressions.ImageDimsExpr
    val png = fixtureBytes("/fixtures/graft-20x7.png")
    val bmp = Media.tinyBmp(5, 3)
    // JPEG via the JDK encoder — the SOF walk must find the frame header
    val jimg = new java.awt.image.BufferedImage(17, 9,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val jbos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(jimg, "jpg", jbos)
    val jpg = jbos.toByteArray
    val junk = "definitely not pixels".getBytes("UTF-8")
    val df = Seq((1L, png), (2L, bmp), (3L, jpg), (4L, junk))
      .toDF("doc_id", "blob")
      .select($"doc_id", ImageDimsExpr($"blob").as("d"))
      .select($"doc_id", $"d.width".as("w"), $"d.height".as("h"))
    val rows = df.collect().map(r => r.getLong(0) ->
      (if (r.isNullAt(1)) None else Some((r.getInt(1), r.getInt(2))))).toMap
    assert(rows(1L).contains((20, 7)))
    assert(rows(2L).contains((5, 3)))
    assert(rows(3L).contains((17, 9)))
    assert(rows(4L).isEmpty)
    // the handcrafted BMP is a real image: the JDK decoder agrees
    assert(Media.imageDimensions(bmp).contains((5, 3)))
    assert(Media.imageDimensions(jpg).contains((17, 9)))
  }

  test("image_dims rejects lookalike headers that ImageIO would reject") {
    import graft.functions.expressions.ImageDimsExpr
    // 'GIF' prefix on arbitrary binary: no valid 87a/89a version triplet
    val gifJunk = "GIFt for you: not an image".getBytes("UTF-8")
    // 'BM' prefix with nonzero reserved shorts / incoherent offsets
    val bmJunk = "BMW parts catalog, binary blob".getBytes("UTF-8")
    // a REAL GIF89a header (13-byte logical screen descriptor) still parses
    val gif = "GIF89a".getBytes("US-ASCII") ++
      Array[Byte](7, 0, 4, 0, 0, 0, 0) // 7x4 logical screen, LE
    val rows = Seq((1L, gifJunk), (2L, bmJunk), (3L, gif))
      .toDF("doc_id", "blob")
      .select($"doc_id", ImageDimsExpr($"blob").as("d"))
      .collect().map(r => r.getLong(0) -> r.isNullAt(1)).toMap
    assert(rows(1L) && rows(2L))
    assert(!rows(3L))
    // and the JDK agrees the junk is junk
    assert(Media.imageDimensions(gifJunk).isEmpty)
    assert(Media.imageDimensions(bmJunk).isEmpty)
  }

  test("image_dims on a non-binary column fails analysis, not codegen") {
    import graft.functions.expressions.ImageDimsExpr
    val df = Seq((1L, "just a string")).toDF("doc_id", "s")
    val e = intercept[org.apache.spark.sql.AnalysisException] {
      df.select(ImageDimsExpr($"s")).collect()
    }
    assert(e.getMessage.toLowerCase.contains("binary"))
  }

  test("sampleFrames explodes every-k frame indices") {
    val junk = Array.fill[Byte](100)(1) // fake n_frames = 1 + 100 % 32 = 5
    val df = Seq((3L, junk)).toDF("doc_id", "blob")
    val frames = Media.sampleFrames(df, "doc_id", "blob", everyK = 2)
      .as[(Long, Int)].collect().toSeq
    assert(frames == Seq((3L, 0), (3L, 2), (3L, 4)))
  }
}
