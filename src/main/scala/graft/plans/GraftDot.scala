package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType}

/** Double dot product between two vectors as a native expression:
  * `graft_dot(a, b)`. Replaces the `udf(VectorOps.dot _)` kernel on the
  * pair-scoring hot paths (d5/d14's cosine verify, x1/x3/x4's brute and
  * cell scoring, x8/x11's re-rank): the ScalaUDF boxes both arrays into
  * Seq[Double] per call — at sf0.1 d5 alone scores 12.5M pairs, and the
  * conversion dominated the kernel.
  *
  * Arithmetic contract: the SAME strictly sequential fold over
  * min(|a|,|b|) elements as [[graft.functions.VectorOps.dot]], which is
  * what keeps every cosine bit-identical to the DuckDB twins'
  * list_reduce (the hash gates depend on this). */
case class GraftDot(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(DoubleType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_dot requires (array<double>, array<double>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = DoubleType
  override def prettyName: String = "graft_dot"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftDot.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.plans.GraftDot.dot($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftDot =
    copy(left = newLeft, right = newRight)
}

object GraftDot {
  /** Static entry for interpreted eval and codegen alike — identical
    * fold order to VectorOps.dot. */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) {
      s += a.getDouble(i) * b.getDouble(i)
      i += 1
    }
    s
  }
}
