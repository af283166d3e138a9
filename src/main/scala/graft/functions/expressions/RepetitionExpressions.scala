package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Per-document repetition statistics over a token array — the Gopher-style
  * quality signals (distinct tokens, top-bigram share, duplicate-trigram
  * share) in ONE scan-side pass.
  *
  * Every statistic here is a function of a single document, so the
  * explode-grams → groupBy(doc, gram) → re-aggregate formulation shuffles
  * the entire gram-expanded corpus twice for what a per-row hash count
  * answers in place — at 100 TB that is the difference between a map-only
  * stage and shuffling ~2× the corpus. Gram conventions mirror
  * Pipeline.tokenGrams exactly: fewer than n tokens collapse to a single
  * whole-text gram (so totals are never zero).
  */
case class RepetitionStatsExpr(child: Expression) extends UnaryExpression
    with ExpectsInputTypes {
  // SQL-surface function: a non-string token array must be an analysis
  // error, not a getUTF8String ClassCastException at runtime.
  override def inputTypes = Seq(ArrayType(StringType))
  override def dataType: DataType = RepetitionStatsExpr.schema
  override def prettyName: String = "repetition_stats"

  override protected def nullSafeEval(tokens: Any): Any =
    RepetitionStatsExpr.stats(tokens.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, t =>
      s"${ev.value} = graft.functions.expressions.RepetitionStatsExpr.stats($t);")

  override protected def withNewChildInternal(c: Expression) = copy(child = c)
}

object RepetitionStatsExpr {
  val schema: StructType = StructType(Seq(
    StructField("n_distinct", IntegerType, nullable = false),
    StructField("big_top", LongType, nullable = false),
    StructField("big_total", LongType, nullable = false),
    StructField("tri_dup", LongType, nullable = false),
    StructField("tri_total", LongType, nullable = false)))

  /** (max count, total, sum of counts ≥ 2) over the n-gram multiset of
    * `toks`; fewer than n tokens → the single whole-text gram (count 1). */
  private def gramStats(toks: Array[String], n: Int): (Long, Long, Long) = {
    if (toks.length < n) return (1L, 1L, 0L)
    val counts = new java.util.HashMap[String, Long]()
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j))
        j += 1
      }
      val k = sb.toString
      counts.put(k, counts.getOrDefault(k, 0L) + 1L)
      i += 1
    }
    var top = 0L
    var dup = 0L
    val it = counts.values().iterator()
    while (it.hasNext) {
      val c = it.next()
      if (c > top) top = c
      if (c >= 2) dup += c
    }
    (top, (toks.length - n + 1).toLong, dup)
  }

  def stats(tokens: ArrayData): InternalRow = {
    val n = tokens.numElements()
    val toks = new Array[String](n)
    var i = 0
    while (i < n) { toks(i) = tokens.getUTF8String(i).toString; i += 1 }
    val distinct = new java.util.HashSet[String]()
    i = 0
    while (i < n) { distinct.add(toks(i)); i += 1 }
    val (bigTop, bigTotal, _) = gramStats(toks, 2)
    val (_, triTotal, triDup) = gramStats(toks, 3)
    new GenericInternalRow(Array[Any](distinct.size, bigTop, bigTotal,
      triDup, triTotal))
  }

  def apply(tokens: Column): Column =
    ColumnBridge.column(RepetitionStatsExpr(ColumnBridge.expression(tokens)))
}
