package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the sketch hashes.
  *
  * The pure-Column formulations in TextFunctions build 64-wide expression
  * trees (one sub-expression per bit) — measured at sf0.1 they dominate the
  * dedup queries and push 12 MiB task binaries. These single-pass versions
  * stay inside whole-stage codegen (`doGenCode` emits a tight loop) and run
  * one array traversal regardless of bit width — the (b) tier of the
  * custom-operator preference order (compose > Expression > Strategy > RDD).
  */

/** 64-bit SimHash over an array<string> of tokens: per-bit majority vote of
  * each token's xxhash64 (seed 42, same as Spark's xxhash64). */
case class SimHash64Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    SimHash64Expr.hash(arr)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHash64Expr.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHash64Expr =
    copy(child = newChild)
}

object SimHash64Expr {
  /** Shared by interpreted eval and generated code. */
  def hash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, 42L)
        var b = 0
        while (b < 64) {
          votes(b) += (((h >>> b) & 1L).toInt * 2 - 1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHash64Expr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}

/** MinHash signature over a shingle-set column — array<string> (raw
  * shingles) or array<long> (hashedShingles): k minimums of seeded xxhash64,
  * one pass over the array for all k. */
case class MinHashSignatureExpr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "minhash_signature"

  private lazy val longInput: Boolean = child.dataType match {
    case ArrayType(LongType, _) => true
    case _ => false
  }

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashSignatureExpr.sig(input.asInstanceOf[ArrayData], k, longInput))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashSignatureExpr.sig($c, $k, $longInput));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashSignatureExpr =
    copy(child = newChild)
}

object MinHashSignatureExpr {
  def sig(arr: ArrayData, k: Int, longInput: Boolean): Array[Long] = {
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (longInput) {
        val v = arr.getLong(i)
        var j = 0
        while (j < k) {
          val h = XXH64.hashLong(v, j.toLong)
          if (h < mins(j)) mins(j) = h
          j += 1
        }
      } else {
        val s = arr.getUTF8String(i)
        if (s != null) {
          var j = 0
          while (j < k) {
            val h = XXH64.hashUnsafeBytes(s.getBaseObject, s.getBaseOffset, s.numBytes, j.toLong)
            if (h < mins(j)) mins(j) = h
            j += 1
          }
        }
      }
      i += 1
    }
    mins
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashSignatureExpr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k))
}

/** Engine-portable MinHash signature over an array<string> of md5-hex
  * shingle hashes: element j of the output is the lexicographic minimum of
  * md5(s"$j:$hex") over the set — the seeded re-hash and the min are both
  * expressible verbatim in DuckDB (`list_min(list_transform(s, h ->
  * md5(j || ':' || h)))`), so the full minhash → band → Jaccard pipeline
  * carries a real oracle. Single pass, all k seeds per element. */
case class MinHashMd5Expr(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "minhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    new GenericArrayData(MinHashMd5Expr.sig(input.asInstanceOf[ArrayData], k))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.expressions.MinHashMd5Expr.sig($c, $k));""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): MinHashMd5Expr =
    copy(child = newChild)
}

object MinHashMd5Expr {
  private val HexChars = "0123456789abcdef".toCharArray

  private def md5Hex(bytes: Array[Byte]): Array[Byte] = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val out = new Array[Byte](32)
    var i = 0
    while (i < 16) {
      out(2 * i) = HexChars((d(i) >> 4) & 0xF).toByte
      out(2 * i + 1) = HexChars(d(i) & 0xF).toByte
      i += 1
    }
    out
  }

  /** Lexicographic byte compare of equal-length ASCII hex arrays. */
  private def less(a: Array[Byte], b: Array[Byte]): Boolean = {
    var i = 0
    while (i < a.length) {
      if (a(i) != b(i)) return a(i) < b(i)
      i += 1
    }
    false
  }

  def sig(arr: ArrayData, k: Int): Array[UTF8String] = {
    val mins = new Array[Array[Byte]](k)
    val n = arr.numElements()
    var j = 0
    while (j < k) {
      val prefix = (j.toString + ":").getBytes("US-ASCII")
      var best: Array[Byte] = null
      var i = 0
      while (i < n) {
        val s = arr.getUTF8String(i)
        if (s != null) {
          val hex = s.getBytes
          val buf = new Array[Byte](prefix.length + hex.length)
          System.arraycopy(prefix, 0, buf, 0, prefix.length)
          System.arraycopy(hex, 0, buf, prefix.length, hex.length)
          val h = md5Hex(buf)
          if (best == null || less(h, best)) best = h
        }
        i += 1
      }
      mins(j) = if (best == null) Array.emptyByteArray else best
      j += 1
    }
    mins.map(UTF8String.fromBytes)
  }

  def apply(c: Column, k: Int): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      MinHashMd5Expr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c), k))
}

/** Engine-portable 64-bit SimHash over an array<string> of tokens: each
  * token's 64-bit hash is the first 8 bytes (big-endian) of md5(token) —
  * DuckDB: `('0x' || substr(md5(t), 1, 16))::UBIGINT` — then the usual
  * per-bit majority vote. Bit pattern identical across engines (signedness
  * only matters if the raw value is exported; the dedup query exports pair
  * ids and hamming distance, both integer-exact). */
case class SimHashMd5Expr(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5"

  override protected def nullSafeEval(input: Any): Any =
    SimHashMd5Expr.hash(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.expressions.SimHashMd5Expr.hash($c);")

  override protected def withNewChildInternal(newChild: Expression): SimHashMd5Expr =
    copy(child = newChild)
}

object SimHashMd5Expr {
  def hash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val s = arr.getUTF8String(i)
      if (s != null) {
        val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes)
        // first 8 digest bytes, big-endian == first 16 hex chars as u64
        var h = 0L
        var bi = 0
        while (bi < 8) { h = (h << 8) | (d(bi) & 0xFFL); bi += 1 }
        var b = 0
        while (b < 64) {
          votes(b) += ((((h >>> b) & 1L).toInt * 2) - 1)
          b += 1
        }
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }

  def apply(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      SimHashMd5Expr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))
}
