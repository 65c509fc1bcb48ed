package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** T5's rolling-hash fingerprint as a native Catalyst expression:
  * `graft_rolling_hash(text)` → `array<bigint>` of
  * `[doc_hash, min_gram_hash]` (the second element null below 8 code
  * points), once [[GraftExtensions]] is installed.
  *
  * The SQL higher-order-function formulation of the same fold is
  * interpreted per element — a struct accumulator allocation per code
  * point put t5 at 3 s even after the O(L²)→O(L) rewrite. This runs the
  * identical arithmetic (see [[graft.functions.Hashing.rollingHash8]])
  * as one tight JVM loop inside whole-stage codegen — same values, no
  * per-element allocation. An array (not a struct) return keeps the
  * two-field projection trivially splittable with `element_at`.
  */
case class GraftRollingHash(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_rolling_hash requires string, got ${child.dataType}")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "graft_rolling_hash"

  override def nullSafeEval(s: Any): Any =
    GraftRollingHash.compute(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftRollingHash.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftRollingHash =
    copy(child = newChild)
}

object GraftRollingHash {
  /** Static entry for interpreted eval and codegen alike. */
  def compute(s: UTF8String): GenericArrayData = {
    val (doc, mn, has) = graft.functions.Hashing.rollingHash8(s.toString)
    new GenericArrayData(Array[Any](doc, if (has) mn else null))
  }
}
