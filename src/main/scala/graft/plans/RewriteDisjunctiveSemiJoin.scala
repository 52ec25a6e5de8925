package graft.plans

import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Or}
import org.apache.spark.sql.catalyst.plans.{LeftAnti, LeftSemi}
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan, Union}
import org.apache.spark.sql.catalyst.rules.Rule

/** SURVEY §4.2's optional rule: a LEFT SEMI join on `c1 OR c2` (the
  * reference's `source IN (...) OR target IN (...)` edge lookup,
  * /root/reference/src/db/client.ts:415-423) admits no equi-join keys, so
  * Spark plans a BroadcastNestedLoopJoin — O(|L|·|R|) comparisons. When both
  * disjuncts are themselves equi-conditions, the semi join is equivalent to
  *
  *   (L ⋉c1 R)  ∪  ((L ▷c1 R) ⋉c2 R)
  *
  * (matches-c1 union matches-c2-but-not-c1): per-row exactly-once, left
  * multiplicity preserved, and every join is now an equi hash join.
  * `GraphOps.relationsForEntities` hand-writes this shape; the rule grants
  * the same plan to any user query that writes the natural OR form.
  */
object RewriteDisjunctiveSemiJoin extends Rule[LogicalPlan] {

  private def isEquiBetween(c: Expression, l: LogicalPlan, r: LogicalPlan): Boolean =
    c match {
      case EqualTo(x, y) =>
        (x.references.subsetOf(l.outputSet) && y.references.subsetOf(r.outputSet)) ||
          (y.references.subsetOf(l.outputSet) && x.references.subsetOf(r.outputSet))
      case _ => false
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case Join(l, r, LeftSemi, Some(Or(c1, c2)), hint)
        if isEquiBetween(c1, l, r) && isEquiBetween(c2, l, r) =>
      val matchesC1 = Join(l, r, LeftSemi, Some(c1), hint)
      val notC1 = Join(l, r, LeftAnti, Some(c1), hint)
      val matchesC2Only = Join(notC1, r, LeftSemi, Some(c2), hint)
      Union(Seq(matchesC1, matchesC2Only))
  }
}
