package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Squared-L2 distance between two BIGINT vectors as a native
  * expression: `graft_l2sq(a, b)`. The
  * `aggregate(zip_with(a, b, (x,y) -> (x-y)²), …)` formulation it
  * replaces is interpreted per element (two lambda frames and an
  * accumulator box per dimension); one JVM loop computes the identical
  * sum — x6's three k-means assignment passes were spending ~1 s each
  * on exactly this. Null if either array is null or lengths differ
  * (the callers always pass equal-length subvectors). */
case class GraftL2Sq(left: Expression, right: Expression) extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t match {
      case ArrayType(LongType, _) => true
      case org.apache.spark.sql.types.NullType => true
      case _ => false
    }
    if (ok(left.dataType) && ok(right.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq requires (array<bigint>, array<bigint>), " +
        s"got (${left.dataType}, ${right.dataType})")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any =
    GraftL2Sq.l2sq(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      java.lang.Long ${ev.value}_r = graft.plans.GraftL2Sq.l2sq($a, $b);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): GraftL2Sq =
    copy(left = newLeft, right = newRight)
}

object GraftL2Sq {
  /** Static entry for interpreted eval and codegen alike. */
  def l2sq(a: ArrayData, b: ArrayData): java.lang.Long = {
    val n = a.numElements()
    if (n != b.numElements()) return null
    var s = 0L
    var i = 0
    while (i < n) {
      val d = a.getLong(i) - b.getLong(i)
      s += d * d
      i += 1
    }
    java.lang.Long.valueOf(s)
  }
}
