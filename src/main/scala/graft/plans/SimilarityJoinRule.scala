package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Expression, GreaterThan, GreaterThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.DoubleType

/** Rewrites the declarative similarity-join shape
  * `Filter(graft_similarity(a, b) >= t ∧ rest, CrossJoin(l, r))` into the
  * native [[SimilarityJoin]] operator, keeping `rest` as a residual
  * filter. The user writes an honest cross join + threshold filter; the
  * engine executes a blocked broadcast similarity join. Sides are
  * chosen by attribute origin (a must come from one side, b from the
  * other; swapped order flips the node's children accordingly — the
  * LEFT child of the node is always the build side a came from).
  */
object SimilarityJoinRule extends Rule[LogicalPlan] with PredicateHelper {

  // (similarity, threshold, strict): a user-written `> t` must stay
  // strict through the rewrite — ratios are rationals 2M/(la+lb), so
  // exact ties at round thresholds are realistic.
  private def threshold(e: Expression): Option[(GraftSimilarity, Double, Boolean)] = e match {
    case GreaterThanOrEqual(s: GraftSimilarity, Literal(t: Double, DoubleType)) if t > 0 => Some((s, t, false))
    case GreaterThan(s: GraftSimilarity, Literal(t: Double, DoubleType)) if t > 0 => Some((s, t, true))
    case _ => None
  }

  // The exec collects its build (left) side on the driver, exactly like
  // BroadcastExchange — so it must respect the same size contract.
  // When the build side's estimated size exceeds
  // spark.sql.autoBroadcastJoinThreshold (or broadcasting is disabled
  // with -1), the rewrite is skipped and the crossJoin + band-filtered
  // similarity predicate plan stands ([[SimilarityBandRule]] keeps that
  // plan correct and pruned) instead of a silent driver OOM.
  private def buildSideFits(l: LogicalPlan): Boolean = {
    val cap = conf.autoBroadcastJoinThreshold
    cap > 0 && l.stats.sizeInBytes <= BigInt(cap)
  }

  // Only the aligned orientation rewrites (first arg from the left
  // side): difflib's ratio is not argument-symmetric near the threshold
  // (autojunk applies to the second argument), so flipping sides to
  // match a swapped predicate could change results.
  private def rewrite(cond: Expression, l: LogicalPlan, r: LogicalPlan): Option[LogicalPlan] = {
    if (!buildSideFits(l)) return None
    val conjuncts = splitConjunctivePredicates(cond)
    conjuncts.iterator.map(c => (c, threshold(c))).collectFirst {
      case (c, Some((sim, t, strict)))
          if sim.left.references.subsetOf(l.outputSet) &&
            sim.right.references.subsetOf(r.outputSet) =>
        (c, SimilarityJoin(l, r, sim.left, sim.right, t, strict))
    }.map { case (consumed, node) =>
      val rest = conjuncts.filterNot(_ eq consumed)
      if (rest.isEmpty) node else Filter(rest.reduce(And), node)
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    // shape before predicate pushdown…
    case f @ Filter(cond, Join(l, r, Cross | Inner, None, _)) =>
      rewrite(cond, l, r).getOrElse(f)
    // …and after PushPredicateThroughJoin folded the filter into the
    // join condition (the shape extraOptimizations actually see)
    case j @ Join(l, r, Cross | Inner, Some(cond), _) =>
      rewrite(cond, l, r).getOrElse(j)
  }
}

/** Plans the logical [[SimilarityJoin]] / [[PartialBestSimilarityJoin]]
  * nodes into their execs. */
object SimilarityJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case SimilarityJoin(l, r, a, b, t, strict) =>
      SimilarityJoinExec(planLater(l), planLater(r), a, b, t, strict) :: Nil
    case PartialBestSimilarityJoin(l, r, a, b, t, strict, resid, ord) =>
      PartialBestSimilarityJoinExec(
        planLater(l), planLater(r), a, b, t, strict, resid, ord) :: Nil
    case _ => Nil
  }
}
