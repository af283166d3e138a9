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
  * Input: an array<struct> sorted ascending whose first two fields are
  * (t_dep: long, t_id: long) — the struct sort order leads with them —
  * plus a threshold. Any FURTHER fields ride along untouched (r14: the
  * projection carries the target's position and ride-cost prefix through
  * the probe so CHANGE edges come out position-enriched). Output: the
  * sub-array of entries with the MINIMAL t_dep strictly greater than the
  * threshold — the earliest reachable departure plus all its ties (empty
  * array when none).
  *
  * Exists because the higher-order-function formulation
  * (`filter` → `get(...,0)` → `filter` again) evaluates the first filter's
  * interpreted lambda up to three times per row after project-collapse, and
  * none of it codegens. Here: one binary search (O(log n)) + a tie scan,
  * inside whole-stage codegen.
  */
case class EarliestAfterExpr(left: Expression, right: Expression)
    extends BinaryExpression with ImplicitCastInputTypes {
  // Registered on the public SQL surface: pin the layout at ANALYSIS time —
  // a canonical 2-field array keeps the implicit-cast behavior (an int
  // threshold is widened by a cast, not by codegen luck); an ENRICHED
  // array (> 2 fields) is accepted as-is and checkInputDataTypes verifies
  // its leading (t_dep, t_id) longs, so a wrong-shaped array is an
  // AnalysisException instead of a misread.
  // (no explicit Seq[AbstractDataType] annotation: that type is
  // private[sql]; the override inherits the parent's signature)
  override def inputTypes = Seq(left.dataType match {
    case ArrayType(st: StructType, nl) if st.length > 2 =>
      // widen the leading (t_dep, t_id) to LONG (same implicit struct
      // cast the canonical 2-field shape gets); enrichment fields as-is
      ArrayType(StructType(
        StructField(st(0).name, LongType) +:
          StructField(st(1).name, LongType) +: st.drop(2)), nl)
    case _ => ArrayType(EarliestAfterExpr.entryType)
  }, LongType)

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    val base = super.checkInputDataTypes()
    if (base.isFailure) base
    else left.dataType match {
      case ArrayType(st: StructType, _) if st.length >= 2 &&
          st(0).dataType == LongType && st(1).dataType == LongType => base
      case _ => org.apache.spark.sql.catalyst.analysis.TypeCheckResult
        .TypeCheckFailure(
          "earliest_after entries must lead with (t_dep BIGINT, t_id BIGINT)")
    }
  }

  private def numFields: Int =
    left.dataType.asInstanceOf[ArrayType]
      .elementType.asInstanceOf[StructType].length

  override def dataType: DataType = left.dataType
  override def prettyName: String = "earliest_after"

  override protected def nullSafeEval(deps: Any, thr: Any): Any =
    EarliestAfterExpr.earliest(deps.asInstanceOf[ArrayData],
      thr.asInstanceOf[Long], numFields)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (deps, thr) =>
      s"${ev.value} = graft.functions.expressions.EarliestAfterExpr" +
        s".earliest($deps, $thr, $numFields);")

  override protected def withNewChildrenInternal(l: Expression, r: Expression) =
    copy(left = l, right = r)
}

object EarliestAfterExpr {
  /** The canonical schedule-entry type the expression accepts. */
  val entryType: StructType = StructType(Seq(
    StructField("t_dep", LongType), StructField("t_id", LongType)))

  /** Struct layout: field 0 = t_dep (long); `nf` = the struct's arity
    * (trailing enrichment fields are copied through untouched). */
  def earliest(arr: ArrayData, thr: Long, nf: Int): ArrayData = {
    val n = arr.numElements()
    // lower bound: first index with t_dep > thr (array sorted by t_dep)
    var lo = 0
    var hi = n
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (arr.getStruct(mid, nf).getLong(0) <= thr) lo = mid + 1 else hi = mid
    }
    if (lo == n) return new GenericArrayData(Array.empty[Any])
    val minDep = arr.getStruct(lo, nf).getLong(0)
    var end = lo + 1
    while (end < n && arr.getStruct(end, nf).getLong(0) == minDep) end += 1
    val out = new Array[Any](end - lo)
    var i = lo
    while (i < end) { out(i - lo) = arr.getStruct(i, nf).copy(); i += 1 }
    new GenericArrayData(out)
  }

  def apply(deps: Column, threshold: Column): Column =
    ColumnBridge.column(EarliestAfterExpr(
      ColumnBridge.expression(deps), ColumnBridge.expression(threshold)))
}
