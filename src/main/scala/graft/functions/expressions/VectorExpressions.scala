package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native vector kernels. The higher-order-function formulations
  * (aggregate ∘ zip_with) interpret a lambda per element — measured ~30×
  * slower on the N²-pair dedup/similarity joins at sf0.1. These run a tight
  * primitive loop inside whole-stage codegen. */

/** Dot product of two numeric array columns (array<float> or array<double>;
  * float elements are widened per element). Left-to-right summation —
  * bit-identical to the fold the HOF version computed. */
case class DotProductExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "dot_product"

  private lazy val leftFloat = DotProductExpr.isFloatArray(left.dataType)
  private lazy val rightFloat = DotProductExpr.isFloatArray(right.dataType)

  override protected def nullSafeEval(a: Any, b: Any): Any =
    DotProductExpr.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftFloat, rightFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.DotProductExpr.dot($a, $b, $leftFloat, $rightFloat);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object DotProductExpr {
  private[expressions] def isFloatArray(dt: DataType): Boolean = dt match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(DotProductExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Sign-LSH bucket id over an array<double> vector: bit i = sign of the dot
  * product with hyperplane i. Planes ride along as a literal matrix. */
case class SignLshBucketExpr(child: Expression, planes: Seq[Seq[Double]])
    extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "sign_lsh_bucket"

  @transient private lazy val matrix: Array[Array[Double]] = planes.map(_.toArray).toArray
  private lazy val floatInput = DotProductExpr.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    SignLshBucketExpr.bucket(input.asInstanceOf[ArrayData], matrix, floatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("planes", matrix, "double[][]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SignLshBucketExpr.bucket($c, $ref, $floatInput);")
  }

  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
}

object SignLshBucketExpr {
  def bucket(v: ArrayData, planes: Array[Array[Double]], floatInput: Boolean): Long = {
    var out = 0L
    var p = 0
    while (p < planes.length) {
      val plane = planes(p)
      val n = math.min(v.numElements(), plane.length)
      var acc = 0.0
      var i = 0
      while (i < n) {
        acc += (if (floatInput) v.getFloat(i).toDouble else v.getDouble(i)) * plane(i)
        i += 1
      }
      if (acc > 0) out |= (1L << p)
      p += 1
    }
    out
  }

  def apply(v: Column, planes: Array[Array[Double]]): Column =
    ColumnBridge.column(SignLshBucketExpr(ColumnBridge.expression(v),
      planes.toSeq.map(_.toSeq)))
}

/** Exact Jaccard similarity of two SORTED DISTINCT array<long> columns
  * (hashed shingle sets): single merge pass, no per-pair hash-set builds —
  * ~100× cheaper than array_intersect/array_union on string arrays in the
  * LSH verify stage. */
case class JaccardSortedExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSortedExpr.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaccardSortedExpr.jaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

/** Exact Jaccard of two SORTED DISTINCT array<string> columns (md5-hex
  * shingle sets): single merge pass on UTF8String binary order — the
  * array_intersect/array_union formulation builds two hash sets per pair,
  * which tripled the md5-dedup verify stage at sf0.1. */
case class JaccardSortedStrExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sorted_str"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    JaccardSortedStrExpr.jaccard(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.JaccardSortedStrExpr.jaccard($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object JaccardSortedStrExpr {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val c = a.getUTF8String(i).compareTo(b.getUTF8String(j))
      if (c == 0) { inter += 1; i += 1; j += 1 }
      else if (c < 0) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSortedStrExpr(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

object JaccardSortedExpr {
  def jaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    if (na == 0 && nb == 0) return 1.0
    var i = 0
    var j = 0
    var inter = 0
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) { inter += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    inter.toDouble / (na + nb - inter).toDouble
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSortedExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}

/** Language-ID over an array<string> of tokens: count hits per stopword
  * list, return the best-scoring language code ("und" on zero hits; ties go
  * to the lexicographically-first code). One pass, hash-set membership. */
case class LangScoreExpr(child: Expression, langs: Seq[(String, Seq[String])])
    extends UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {
  override def dataType: DataType = StringType
  override def prettyName: String = "lang_id"

  @transient private lazy val codes: Array[String] = langs.map(_._1).toArray
  @transient private lazy val sets: Array[java.util.HashSet[String]] =
    langs.map { case (_, ws) =>
      val s = new java.util.HashSet[String]()
      ws.foreach(w => s.add(w))
      s
    }.toArray

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val hits = new Array[Int](codes.length)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val t = arr.getUTF8String(i)
      if (t != null) {
        val w = t.toString.toLowerCase
        var j = 0
        while (j < sets.length) { if (sets(j).contains(w)) hits(j) += 1; j += 1 }
      }
      i += 1
    }
    var best = -1
    var bestHits = 0
    var j = 0
    while (j < hits.length) {
      if (hits(j) > bestHits) { best = j; bestHits = hits(j) }
      j += 1
    }
    org.apache.spark.unsafe.types.UTF8String.fromString(
      if (best < 0) "und" else codes(best))
  }

  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
}

object LangScoreExpr {
  def apply(toks: Column, langs: Map[String, Seq[String]]): Column =
    ColumnBridge.column(LangScoreExpr(ColumnBridge.expression(toks),
      langs.toSeq.sortBy(_._1)))
}

/** Int8 quantization of a numeric vector: struct(scale: double, q: binary)
  * with q_i = round(v_i / scale), scale = max|v| / 127. At 100 TB this is
  * the similarity-search storage lever — a 4× (vs float) / 8× (vs double)
  * IO cut for the re-rank stage, with ~1% cosine error on unit vectors. */
case class QuantizeInt8Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = QuantizeInt8Expr.schema
  override def prettyName: String = "quantize_int8"

  private lazy val floatInput = DotProductExpr.isFloatArray(child.dataType)

  override protected def nullSafeEval(input: Any): Any =
    QuantizeInt8Expr.quantize(input.asInstanceOf[ArrayData], floatInput)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.QuantizeInt8Expr.quantize($c, $floatInput);")

  override protected def withNewChildInternal(newChild: Expression) = copy(child = newChild)
}

object QuantizeInt8Expr {
  val schema: StructType = StructType(Seq(
    StructField("scale", DoubleType, nullable = false),
    StructField("q", BinaryType, nullable = false)))

  def quantize(v: ArrayData, floatInput: Boolean): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = math.abs(if (floatInput) v.getFloat(i).toDouble else v.getDouble(i))
      if (x > maxAbs) maxAbs = x
      i += 1
    }
    val scale = if (maxAbs == 0.0) 0.0 else maxAbs / 127.0
    val q = new Array[Byte](n)
    if (scale != 0.0) {
      i = 0
      while (i < n) {
        val x = if (floatInput) v.getFloat(i).toDouble else v.getDouble(i)
        q(i) = math.round(x / scale).toByte
        i += 1
      }
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](scale, q))
  }

  def apply(v: Column): Column =
    ColumnBridge.column(QuantizeInt8Expr(ColumnBridge.expression(v)))
}

/** Dot product of two int8-quantized vectors (QuantizeInt8Expr structs):
  * integer multiply-accumulate, scaled back — the cheap re-rank kernel. */
case class QuantizedDotExpr(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "quantized_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    QuantizedDotExpr.dot(a.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow],
      b.asInstanceOf[org.apache.spark.sql.catalyst.InternalRow])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.expressions.QuantizedDotExpr.dot($a, $b);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object QuantizedDotExpr {
  def dot(a: org.apache.spark.sql.catalyst.InternalRow,
      b: org.apache.spark.sql.catalyst.InternalRow): Double = {
    val sa = a.getDouble(0)
    val sb = b.getDouble(0)
    if (sa == 0.0 || sb == 0.0) return 0.0
    val qa = a.getBinary(1)
    val qb = b.getBinary(1)
    // fail loudly: the binary payload hides dimensionality, and a silent
    // min-length truncation would return plausible-but-wrong similarities
    if (qa.length != qb.length)
      throw new IllegalArgumentException(
        s"quantized_dot: dimension mismatch ${qa.length} vs ${qb.length}")
    var acc = 0L
    var i = 0
    while (i < qa.length) { acc += qa(i).toLong * qb(i).toLong; i += 1 }
    sa * sb * acc.toDouble
  }

  def apply(a: Column, b: Column): Column =
    ColumnBridge.column(QuantizedDotExpr(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
