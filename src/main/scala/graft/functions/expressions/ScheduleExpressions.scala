package graft.functions.expressions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, ImplicitCastInputTypes}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Earliest-departure probe over a SORTED schedule array — the projection's
  * CHANGE-edge kernel (projection.TimeExpandedGraph.build).
  *
  * Input: an array<struct<t_dep:long, t_id:long>> sorted ascending (struct
  * order = (t_dep, t_id)) and a threshold. Output: the sub-array of entries
  * with the MINIMAL t_dep strictly greater than the threshold — i.e. the
  * earliest reachable departure plus all its ties (empty array when none).
  *
  * Exists because the higher-order-function formulation
  * (`filter` → `get(...,0)` → `filter` again) evaluates the first filter's
  * interpreted lambda up to three times per row after project-collapse, and
  * none of it codegens. Here: one binary search (O(log n)) + a tie scan,
  * inside whole-stage codegen.
  */
case class EarliestAfterExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // Registered on the public SQL surface: pin the schedule layout (field 0 =
  // t_dep LONG, field 1 = t_id LONG) and the threshold type at ANALYSIS time,
  // so an int threshold is widened by a cast (not by codegen luck) and a
  // wrong-shaped array is an AnalysisException instead of a misread.
  // (no explicit Seq[AbstractDataType] annotation: that type is
  // private[sql]; the override inherits the parent's signature)
  override def inputTypes = Seq(ArrayType(EarliestAfterExpr.entryType), LongType)
  override def dataType: DataType = left.dataType
  override def prettyName: String = "earliest_after"

  override protected def nullSafeEval(deps: Any, thr: Any): Any =
    EarliestAfterExpr.earliest(deps.asInstanceOf[ArrayData],
      thr.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (deps, thr) =>
      s"${ev.value} = graft.functions.expressions.EarliestAfterExpr.earliest($deps, $thr);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object EarliestAfterExpr {
  /** The canonical schedule-entry type the expression accepts. */
  val entryType: StructType = StructType(Seq(
    StructField("t_dep", LongType), StructField("t_id", LongType)))

  /** Struct layout: field 0 = t_dep (long), field 1 = t_id (long). */
  def earliest(arr: ArrayData, thr: Long): ArrayData = {
    val n = arr.numElements()
    // lower bound: first index with t_dep > thr (array sorted by t_dep)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, 2).getLong(0) <= thr) lo = mid + 1 else hi = mid
    }
    if (lo == n) return new GenericArrayData(Array.empty[Any])
    val minDep = arr.getStruct(lo, 2).getLong(0)
    var end = lo + 1
    while (end < n && arr.getStruct(end, 2).getLong(0) == minDep) end += 1
    val out = new Array[Any](end - lo)
    var i = lo
    while (i < end) { out(i - lo) = arr.getStruct(i, 2).copy(); i += 1 }
    new GenericArrayData(out)
  }

  def apply(deps: Column, threshold: Column): Column =
    ColumnBridge.column(EarliestAfterExpr(
      ColumnBridge.expression(deps), ColumnBridge.expression(threshold)))
}
