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

  test("sampleFrames explodes every-k frame indices") {
    val junk = Array.fill[Byte](100)(1) // fake n_frames = 1 + 100 % 32 = 5
    val df = Seq((3L, junk)).toDF("doc_id", "blob")
    val frames = Media.sampleFrames(df, "doc_id", "blob", everyK = 2)
      .as[(Long, Int)].collect().toSeq
    assert(frames == Seq((3L, 0), (3L, 2), (3L, 4)))
  }
}
