package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}

/** T8's per-document repetition counters as one native pass:
  * `graft_bigram_stats(tokens)` → `[n_bigrams, n_distinct, top_count]`.
  *
  * Replaces an explode → two hash-aggregate formulation: per-document
  * bigram counting needs no cross-row state at all, so at any scale the
  * right plan is a MAPPER — the explode shipped every adjacent-pair row
  * (tokens × documents) through two aggregation stages to compute what
  * one per-row hash map holds transiently. Bigram identity is the same
  * `w1_w2` string join the previous formulation (and the DuckDB twin)
  * counts, so all three counters are bit-identical. */
case class GraftBigramStats(child: Expression) extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | org.apache.spark.sql.types.NullType =>
      TypeCheckResult.TypeCheckSuccess
    case t => TypeCheckResult.TypeCheckFailure(
      s"graft_bigram_stats requires array<string>, got $t")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "graft_bigram_stats"

  override def nullSafeEval(a: Any): Any =
    GraftBigramStats.compute(a.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.plans.GraftBigramStats.compute($c)")

  override protected def withNewChildInternal(newChild: Expression): GraftBigramStats =
    copy(child = newChild)
}

object GraftBigramStats {
  /** Static entry for interpreted eval and codegen alike. */
  def compute(a: ArrayData): GenericArrayData = {
    val n = a.numElements()
    if (n < 2) return new GenericArrayData(Array[Any](0L, 0L, 0L))
    val counts = new java.util.HashMap[String, Integer]()
    var top = 0
    var prev = a.getUTF8String(0).toString
    var i = 1
    while (i < n) {
      val cur = a.getUTF8String(i).toString
      val c = counts.merge(prev + "_" + cur, Integer.valueOf(1),
        (x, y) => Integer.valueOf(x.intValue() + y.intValue()))
      if (c.intValue() > top) top = c.intValue()
      prev = cur
      i += 1
    }
    new GenericArrayData(Array[Any]((n - 1).toLong, counts.size.toLong, top.toLong))
  }
}
