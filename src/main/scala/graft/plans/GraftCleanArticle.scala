package graft.plans

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** F2/F3 (supplier article cleaning, ref main.py:1285-1318 / 1508-1526)
  * as native single-pass expressions. The Column-chain formulation is
  * semantically identical but its CASE branches re-evaluate the shared
  * `translate(trim(...))`/digit-strip subtrees up to six times per row
  * (conditional branches defeat codegen subexpression elimination),
  * which made the E1 hot path regex-bound. One JVM pass per row computes
  * the same value; see [[graft.functions.ArticleClean]] for the kernels
  * and the exact semantics contract. */
abstract class GraftCleanArticleBase extends UnaryExpression {
  override def checkInputDataTypes(): TypeCheckResult = {
    def ok(t: DataType) = t == StringType || t == org.apache.spark.sql.types.NullType
    if (ok(child.dataType)) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${child.dataType}")
  }
}

/** Vitya variant: always-an-integer article (digit-run concatenation),
  * `graft_clean_article_int` in SQL. */
case class GraftCleanArticleInt(child: Expression) extends GraftCleanArticleBase {
  override def dataType: DataType = LongType
  override def prettyName: String = "graft_clean_article_int"

  override def nullSafeEval(s: Any): Any =
    graft.functions.ArticleClean.vitya(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long ${ev.value}_r = graft.functions.ArticleClean.vitya($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r.longValue(); }
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftCleanArticleInt =
    copy(child = newChild)
}

/** Dimi variant: article stays a string, `graft_clean_article_str`. */
case class GraftCleanArticleStr(child: Expression) extends GraftCleanArticleBase {
  override def dataType: DataType = StringType
  override def prettyName: String = "graft_clean_article_str"

  override def nullSafeEval(s: Any): Any =
    graft.functions.ArticleClean.dimi(s.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      UTF8String ${ev.value}_r = graft.functions.ArticleClean.dimi($c);
      if (${ev.value}_r == null) { ${ev.isNull} = true; }
      else { ${ev.value} = ${ev.value}_r; }
    """)

  override protected def withNewChildInternal(newChild: Expression): GraftCleanArticleStr =
    copy(child = newChild)
}
