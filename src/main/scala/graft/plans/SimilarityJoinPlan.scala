package graft.plans

import graft.functions.Similarity
import java.util.Locale
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, BindReferences, Expression, JoinedRow, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}

/** Logical node for a similarity join: inner join of `left` × `right`
  * keeping pairs with difflib-parity ratio(leftName, rightName) ≥
  * threshold. Produced by [[SimilarityJoinRule]] from the declarative
  * `crossJoin(...).filter(graft_similarity(a, b) >= t)` shape — users
  * never build it directly, Catalyst swaps it in transparently. Output
  * is the plain join output; downstream references to
  * `graft_similarity(a, b)` re-evaluate the (deterministic) expression.
  */
case class SimilarityJoin(
    left: LogicalPlan, right: LogicalPlan,
    leftName: Expression, rightName: Expression,
    threshold: Double, strict: Boolean) extends BinaryNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): SimilarityJoin =
    copy(left = newLeft, right = newRight)
}

/** Physical similarity join: the LEFT child (the candidate pool — small
  * by construction, it is the cross join's build side) is collected and
  * broadcast with pre-lowercased names; the right child streams through
  * a per-partition loop that applies the lossless length-band bound and
  * difflib's upper-bound cascade before the quadratic ratio. This is
  * the whole-operator form of [[graft.operators.FuzzyJoin]]'s plan —
  * one operator instead of join+filter+UDF, no codegen boundary crossing
  * per predicate.
  */
case class SimilarityJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftName: Expression, rightName: Expression,
    threshold: Double, strict: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SimilarityJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftBound = BindReferences.bindReference(leftName, left.output)
    val leftRows = left.executeCollect().map { r =>
      val n = leftBound.eval(r)
      (r.copy(), if (n == null) null else n.toString.toLowerCase(Locale.ROOT))
    }
    val bLeft = sparkContext.broadcast(leftRows)
    val rightBound = BindReferences.bindReference(rightName, right.output)
    val attrs = output
    val thr = threshold
    val isStrict = strict
    right.execute().mapPartitions { iter =>
      val lhs = bLeft.value
      val joiner = new JoinedRow
      val proj = UnsafeProjection.create(attrs, attrs)
      iter.flatMap { rRow =>
        val rn = rightBound.eval(rRow)
        if (rn == null) Iterator.empty
        else {
          val rLower = rn.toString.toLowerCase(Locale.ROOT)
          val lb = rLower.length
          // stream side rows are buffer-reused → copy once per match set
          lhs.iterator.flatMap { case (lRow, lLower) =>
            if (lLower == null) Iterator.empty
            else {
              val la = lLower.length
              if (la + lb == 0 || 2.0 * math.min(la, lb) / (la + lb) < thr) Iterator.empty
              else {
                // The cascade returns a (cheap) upper BOUND only when it is
                // already < thr, so both comparators see exact ratios at and
                // above the threshold — `strict` preserves a user-written
                // `> t` exactly (ties at t excluded), `>= t` includes them.
                val r = Similarity.lowercasedRatioAtLeast(lLower, rLower, thr)
                val keep = if (isStrict) r > thr else r >= thr
                if (keep) Iterator.single(proj(joiner(lRow, rRow)).copy())
                else Iterator.empty
              }
            }
          }
        }
      }
    }
  }
}
