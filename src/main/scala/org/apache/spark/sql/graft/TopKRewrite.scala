package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions.{Alias, And, Attribute, Cast, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, IntegerLiteral, LessThan, LessThanOrEqual, PredicateHelper, RowNumber, SpecifiedWindowFrame, WindowExpression}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, CurrentRow, RowFrame, UnboundedPreceding}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan, Project, Window, WindowGroupLimit}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{IntegerType, LongType}

/** Optimizer rule: rewrite the declarative top-k-per-key spelling —
  *
  *   `Filter(row_number() OVER (PARTITION BY k ORDER BY o) <= k, Window(...))`
  *
  * — into [[TopKPerKeyNode]], so users who write the standard SQL window
  * pattern get the bounded-heap exec (one pass, O(n log k), no partition
  * sort) without calling the operator API. This is the fourth corner of
  * the extension quartet: logical node + planner strategy + physical exec
  * + optimizer rule.
  *
  * Semantics guard: the rewrite fires only when the Window computes
  * EXACTLY ONE expression and it is `row_number()` with the standard
  * resolved frame (ROWS UNBOUNDED PRECEDING .. CURRENT ROW), the ordering
  * is non-empty, and the filter bounds that attribute above by a positive
  * integer literal (`rn <= k`, `rn < k`, `k >= rn`, `k > rn`, `rn = 1`).
  * Remaining conjuncts stay as a Filter on top. Ties: row_number over a
  * non-unique ordering is nondeterministic in Spark, and the heap's tie
  * behavior sits inside the same freedom.
  *
  * Spark ≥3.5 already inserts a [[WindowGroupLimit]] below the Window for
  * this shape (a per-partition pre-prune that still sorts); the matcher
  * sees through it and replaces the whole sandwich.
  *
  * Registered per-session via `TopKPerKey.registerRewrite` (which also
  * registers the planner strategy) — opt-in, like the operator itself.
  */
object TopKRewriteRule extends Rule[LogicalPlan] with PredicateHelper {

  private def isRowNumberFrame(we: WindowExpression): Boolean =
    we.windowSpec.frameSpecification match {
      case SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow) => true
      case _ => false
    }

  /** `cond` conjunct → upper bound on `rn` (inclusive), if it is one. */
  private def boundOf(rn: Attribute, e: Expression): Option[Int] = e match {
    case LessThanOrEqual(a: AttributeReference, IntegerLiteral(k))
      if a.semanticEquals(rn) => Some(k)
    case LessThan(a: AttributeReference, IntegerLiteral(k))
      if a.semanticEquals(rn) => Some(k - 1)
    case GreaterThanOrEqual(IntegerLiteral(k), a: AttributeReference)
      if a.semanticEquals(rn) => Some(k)
    case GreaterThan(IntegerLiteral(k), a: AttributeReference)
      if a.semanticEquals(rn) => Some(k - 1)
    case EqualTo(a: AttributeReference, IntegerLiteral(1))
      if a.semanticEquals(rn) => Some(1)
    case EqualTo(IntegerLiteral(1), a: AttributeReference)
      if a.semanticEquals(rn) => Some(1)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ Filter(cond,
        w @ Window(Seq(alias @ Alias(we: WindowExpression, _)), partSpec,
          orderSpec, windowChild, _))
        if we.windowFunction.isInstanceOf[RowNumber] && isRowNumberFrame(we) &&
          orderSpec.nonEmpty && partSpec.forall(_.deterministic) =>
      // see through the WindowGroupLimit pre-prune Spark ≥3.5 inserts
      val child = windowChild match {
        case wgl: WindowGroupLimit => wgl.child
        case c => c
      }
      val rnAttr = alias.toAttribute
      val conjuncts = splitConjunctivePredicates(cond)
      val bounds = conjuncts.flatMap(c => boundOf(rnAttr, c).map(c -> _))
      if (bounds.isEmpty || bounds.map(_._2).min <= 0) f
      else {
        val k = bounds.map(_._2).min
        val used = bounds.map(_._1).toSet
        val rk = AttributeReference("rk", LongType, nullable = false)()
        val topk = TopKPerKeyNode(partSpec, orderSpec, k, child, rk)
        val proj = Project(
          child.output :+ Alias(Cast(rk, IntegerType), alias.name)(
            exprId = rnAttr.exprId),
          topk)
        val rest = conjuncts.filterNot(used)
        if (rest.isEmpty) proj else Filter(rest.reduce(And), proj)
      }
  }
}
