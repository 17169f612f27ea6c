package graft.plans

import org.apache.spark.sql.catalyst.expressions.PredicateHelper
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** JOIN-ORDER SANITY for graft catalog tables — the consumer of the
  * engine's size/selectivity statistics that Spark's own cost-based
  * reorder cannot be: `CostBasedJoinReorder` needs catalog row counts
  * (`ANALYZE TABLE` into the session catalog), which a DSv2 V1-bridge
  * table never has, so multi-join SQL over graft tables executes in
  * WRITTEN order even when the written order joins the two big tables
  * first and the selective small one last.
  *
  * The rule reassociates the classic left-deep mistake:
  *
  *   ((L ⋈a M) ⋈b S)   →   ((L ⋈b S) ⋈a M)
  *
  * when both joins are INNER (associativity/commutativity hold), `b`'s
  * condition references only L and S (so it is legal one level down),
  * no user hint sits on either join, and S's estimated bytes are
  * strictly smaller than M's — sizes from the SAME selectivity-priced
  * estimate the broadcast rule uses ([[BroadcastStatsRule
  * .graftSideBytes]]: manifest/stats pruning under the side's
  * predicates, NDV-priced equality selectivity) with `plan.stats` as
  * the fallback for non-graft sides; at least one side of the
  * comparison must be graft-priced, or the rule stays out of plans it
  * knows nothing about. Joining the selective side first shrinks the
  * intermediate result every later stage carries — at 100 TB the
  * difference between a plan that works and one that shuffles a
  * fact×fact blow-up. The original output ORDER is restored with a
  * Project (same move as Spark's own ReorderJoin).
  */
object JoinOrderRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.joinReorder.enabled", "true").toBoolean

  /** Estimated bytes: graft-priced when the side is a graft scan tree
    * (selectivity included), Spark's logical sizeInBytes otherwise.
    * The Boolean marks a graft-backed estimate.
    */
  private def sideBytes(side: LogicalPlan): (BigInt, Boolean) =
    BroadcastStatsRule.graftSideBytes(side) match {
      case Some(b) => (BigInt(b), true)
      case None => (side.stats.sizeInBytes, false)
    }

  private def noHints(h: JoinHint): Boolean =
    h.leftHint.forall(_.strategy.isEmpty) &&
      h.rightHint.forall(_.strategy.isEmpty)

  /** The left side's inner join, peeled through the attribute-only
    * Project column pruning leaves between consecutive joins (aliases /
    * computed columns disqualify: the outer condition could reference
    * them, and they would not resolve from the re-associated children).
    */
  private def innerJoinOf(p: LogicalPlan): Option[Join] = p match {
    case j: Join => Some(j)
    case Project(pl, j: Join)
        if pl.forall(_.isInstanceOf[
          org.apache.spark.sql.catalyst.expressions.Attribute]) => Some(j)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformUp {
      case outer @ Join(left, s, Inner, Some(condB), outerHint)
          if noHints(outerHint) && innerJoinOf(left).exists {
            case Join(l, _, Inner, Some(_), innerHint) =>
              noHints(innerHint) &&
                condB.references.subsetOf(l.outputSet ++ s.outputSet) &&
                condB.references.intersect(l.outputSet).nonEmpty &&
                condB.references.intersect(s.outputSet).nonEmpty
            case _ => false
          } =>
        val inner = innerJoinOf(left).get
        val (l, m, condA, innerHint) =
          (inner.left, inner.right, inner.condition.get, inner.hint)
        val (mBytes, mGraft) = sideBytes(m)
        val (sBytes, sGraft) = sideBytes(s)
        if ((mGraft || sGraft) && sBytes < mBytes) {
          // (L ⋈b S) first, re-pruned to what the level above consumes,
          // then ⋈a M; a final Project restores the original output order
          val newInner = Join(l, s, Inner, Some(condB), innerHint)
          val needed = org.apache.spark.sql.catalyst.expressions
            .AttributeSet(outer.output) ++ condA.references
          val pruned = Project(
            newInner.output.filter(needed.contains), newInner)
          val newOuter = Join(pruned, m, Inner, Some(condA), outerHint)
          logInfo(s"graft join reorder: selective side (~$sBytes B) " +
            s"joins before the larger (~$mBytes B)")
          Project(outer.output, newOuter)
        } else outer
    }
  }
}
