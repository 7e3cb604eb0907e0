package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: strengthen `levenshtein(a, b) <= k` with its free
  * length-difference lower bound.
  *
  * `|length(a) - length(b)|` lower-bounds edit distance, so
  * `levenshtein(a,b) <= k  ≡  abs(length(a)-length(b)) <= k AND
  * levenshtein(a,b) <= k`. The added conjunct is O(1) per row and
  * short-circuits the O(n·m) levenshtein for most pairs in a similarity
  * join (see q49, where the guard is 10× on the sample workload); with the
  * rule, user queries get the guard without writing it.
  *
  * Idempotent: skips predicates already guarded. The check is structural —
  * any `abs(...) <= /<` conjunct with the same bound counts as the guard —
  * NOT semantic equality against the freshly-built guard, because constant
  * folding rewrites the installed guard (`length('abc')` → `3`) between
  * optimizer passes and a semantic check would then re-add it every pass
  * (observed as stacked guards once the rule ran via both
  * SparkSessionExtensions and extraOptimizations). Only `<=`/`<` with a
  * foldable bound are rewritten — other shapes pass through untouched.
  */
object LevenshteinBoundRule extends Rule[LogicalPlan] {

  private def hasGuard(cond: Expression, bound: Expression): Boolean =
    cond.exists {
      case LessThanOrEqual(Abs(_, _), b) => b.semanticEquals(bound)
      case LessThan(Abs(_, _), b) => b.semanticEquals(bound)
      case _ => false
    }

  private def strengthen(cond: Expression): Expression = cond.transformUp {
    case cmp @ LessThanOrEqual(Levenshtein(l, r, None), bound)
        if bound.foldable && !hasGuard(cond, bound) =>
      And(LessThanOrEqual(Abs(Subtract(Length(l), Length(r))), bound), cmp)
    case cmp @ LessThan(Levenshtein(l, r, None), bound)
        if bound.foldable && !hasGuard(cond, bound) =>
      And(LessThan(Abs(Subtract(Length(l), Length(r))), bound), cmp)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val next = strengthen(cond)
      if (next.fastEquals(cond)) f else Filter(next, child)
    case j: org.apache.spark.sql.catalyst.plans.logical.Join if j.condition.isDefined =>
      val next = strengthen(j.condition.get)
      if (next.fastEquals(j.condition.get)) j else j.copy(condition = Some(next))
  }
}
