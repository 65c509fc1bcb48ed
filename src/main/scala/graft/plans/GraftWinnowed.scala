package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** t45's winnow selection as a native codegen'd expression (r17
  * optimization round): `GraftWinnowed.column(text, k, w)` →
  * `array<bigint>` of the DISTINCT encoded fingerprints
  * e = hash(gram at i)·2²² + (2²²−1−i) that are minimal in some full
  * window of `w` consecutive k-gram positions — byte-identical to the
  * explode + per-doc window-min + distinct formulation it replaces
  * (WinnowKernelSpec proves set equality against that formulation and
  * a brute-force reference), computed in one O(L) deque pass
  * ([[graft.functions.Hashing.winnowedEncoded]]) with no per-position
  * row, no doc-keyed shuffle of gram rows, and no sort. k and w are
  * plan-time constants (the operator's spec). The 2²²-position
  * encoding guard stays with the caller, unchanged. */
case class GraftWinnowed(child: Expression, k: Int, w: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(child.dataType) && k > 0 && w > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_winnowed requires (string, k > 0, w > 0), got ${child.dataType}, k=$k, w=$w")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_winnowed"

  override def nullSafeEval(s: Any): Any =
    GraftWinnowed.compute(s.asInstanceOf[UTF8String], k, w)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftWinnowed.compute($c, $k, $w)")

  override protected def withNewChildInternal(newChild: Expression): GraftWinnowed =
    copy(child = newChild)
}

object GraftWinnowed {
  /** Static entry for interpreted eval and codegen alike. */
  def compute(s: UTF8String, k: Int, w: Int): GenericArrayData =
    new GenericArrayData(graft.functions.Hashing.winnowedEncoded(s.toString, k, w))

  def column(text: Column, k: Int, w: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      GraftWinnowed(org.apache.spark.sql.graft.ColumnBridge.expression(text), k, w))
}
