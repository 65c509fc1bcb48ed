package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** d23's per-position k-gram rolling hash as a native codegen'd
  * expression: `GraftGramHashes.column(text, k)` → `array<bigint>` of
  * one polynomial hash per 0-based k-gram start position (empty array
  * below k units). One tight O(L) JVM loop inside whole-stage codegen
  * ([[graft.functions.Hashing.gramHashes]]) — the higher-order-function
  * SQL formulation of the same values refolds k units per position
  * (O(L·k)) and allocates per element; at 100 TB the gram pass IS the
  * dominant scan, so it must run at primitive speed. k is a plan-time
  * constant (part of the operator's spec, like shingle width), not a
  * runtime column. */
case class GraftGramHashes(child: Expression, k: Int) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(child.dataType) && k > 0) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_gram_hashes requires (string, k > 0), got ${child.dataType}, k=$k")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_gram_hashes"

  override def nullSafeEval(s: Any): Any =
    GraftGramHashes.compute(s.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftGramHashes.compute($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): GraftGramHashes =
    copy(child = newChild)
}

object GraftGramHashes {
  /** Static entry for interpreted eval and codegen alike. */
  def compute(s: UTF8String, k: Int): GenericArrayData =
    new GenericArrayData(graft.functions.Hashing.gramHashes(s.toString, k))

  def column(text: Column, k: Int): Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      GraftGramHashes(org.apache.spark.sql.graft.ColumnBridge.expression(text), k))
}
