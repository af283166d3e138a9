package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.types._

/** Header-only image dimension parse as a NATIVE codegen'd expression:
  * `image_dims(binary)` → struct(width, height), null for non-image bytes.
  *
  * The [[graft.multimodal.Media]] mapPartitions path exists for work that
  * genuinely needs per-partition state (full raster decode, re-encode);
  * the dimension READ is a pure per-row function of the first bytes, so
  * expressing it as an Expression keeps it inside whole-stage codegen,
  * usable from SQL, and — unlike an RDD round-trip — legal in Structured
  * Streaming plans and pure-column pipelines. Formats: PNG, GIF, BMP
  * (both DIB header vintages, top-down heights normalized), and JPEG (SOF
  * segment walk). All reads are bounds-checked big/little-endian arithmetic
  * over the byte array — no decoder library, deterministic everywhere. */
case class ImageDimsExpr(child: Expression) extends UnaryExpression with ExpectsInputTypes {
  override def dataType: DataType = ImageDimsExpr.schema
  override def inputTypes = Seq(BinaryType)
  override def nullable: Boolean = true
  override def prettyName: String = "image_dims"

  override protected def nullSafeEval(input: Any): Any =
    ImageDimsExpr.parse(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.expressions.ImageDimsExpr.parse($c);
      ${ev.isNull} = ${ev.value} == null;
    """)

  override protected def withNewChildInternal(newChild: Expression): ImageDimsExpr =
    copy(child = newChild)
}

object ImageDimsExpr {
  val schema: StructType = StructType(Seq(
    StructField("width", IntegerType, nullable = false),
    StructField("height", IntegerType, nullable = false)))

  /** Shared by interpreted eval and generated code. Null (not an exception)
    * for anything that is not a recognized image header — the column analog
    * of Media.imageDimensions' None. */
  def parse(bytes: Array[Byte]): InternalRow = {
    if (bytes == null || bytes.length < 10) return null
    @inline def u8(i: Int): Int = bytes(i) & 0xff
    def be16(i: Int): Int = (u8(i) << 8) | u8(i + 1)
    def le16(i: Int): Int = u8(i) | (u8(i + 1) << 8)
    def be32(i: Int): Int = (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
    def le32(i: Int): Int = u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
    def row(w: Int, h: Int): InternalRow =
      if (w > 0 && h > 0) new GenericInternalRow(Array[Any](w, h)) else null

    // PNG: 8-byte signature, IHDR width/height big-endian at 16/20
    if (bytes.length >= 24 && u8(0) == 0x89 && bytes(1) == 'P' &&
        bytes(2) == 'N' && bytes(3) == 'G')
      return row(be32(16), be32(20))
    // GIF87a/89a: logical screen size little-endian at 6/8. The version
    // triplet must be exactly "87a" or "89a" — a bare 'GIF' prefix on
    // arbitrary binary is not an image (Media.imageDimensions would reject
    // it through ImageIO, and the dims oracle pins NULL there).
    if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
        bytes(3) == '8' && (bytes(4) == '7' || bytes(4) == '9') && bytes(5) == 'a')
      return row(le16(6), le16(8))
    // BMP: DIB size at 14 picks the header vintage; negative height =
    // top-down row order, dimension is the magnitude. 'BM' alone is two
    // printable bytes, so demand the rest of the file header be coherent:
    // reserved shorts zero, pixel-data offset past the headers and inside
    // the declared file size, DIB size a known vintage.
    if (bytes.length >= 26 && bytes(0) == 'B' && bytes(1) == 'M') {
      val fileSize = le32(2)
      val reservedZero = le16(6) == 0 && le16(8) == 0
      val pixelOffset = le32(10)
      val dib = le32(14)
      val knownDib = dib == 12 || dib == 40 || dib == 52 || dib == 56 ||
        dib == 64 || dib == 108 || dib == 124
      val plausible = reservedZero && knownDib &&
        pixelOffset >= 14 + dib && fileSize > 0 && pixelOffset <= fileSize
      return if (!plausible) null
      else if (dib == 12) row(le16(18), le16(20)) // BITMAPCOREHEADER
      else if (bytes.length >= 30) row(le32(18), math.abs(le32(22)))
      else null
    }
    // JPEG: walk marker segments to the first frame header (SOF0-15 minus
    // the non-frame 0xC4/C8/CC); height at +5, width at +7, big-endian
    if (u8(0) == 0xff && u8(1) == 0xd8) {
      var i = 2
      while (i + 9 <= bytes.length) {
        if (u8(i) != 0xff) return null
        val m = u8(i + 1)
        if (m == 0xff) i += 1 // fill byte
        else if (m == 0x01 || (m >= 0xd0 && m <= 0xd9)) i += 2 // standalone
        else {
          if (i + 4 > bytes.length) return null
          val len = be16(i + 2)
          if (len < 2) return null
          if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 && m != 0xcc) {
            if (i + 9 > bytes.length) return null
            return row(be16(i + 7), be16(i + 5))
          }
          i += 2 + len
        }
      }
      return null
    }
    null
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      ImageDimsExpr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
