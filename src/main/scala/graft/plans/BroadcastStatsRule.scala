package graft.plans

import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, GreaterThan, GreaterThanOrEqual, In, LessThan, LessThanOrEqual, Literal, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, HintInfo, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.plans.logical.BROADCAST
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.{sources => sf}

import graft.sources.GraftTable

/** Broadcast sizing for graft CATALOG tables — the planner half of
  * [[graft.sources.TableStats]].
  *
  * The graft DSv2 catalog reads through Spark's [[org.apache.spark.sql
  * .connector.read.V1Scan]] bridge (so every SQL read shares the one
  * `scanManifest` plan), and the bridge provably drops statistics:
  * `V2ScanRelationPushDown` wraps a V1Scan in `V1ScanWrapper`, which
  * does NOT implement SupportsReportStatistics, so the scan relation
  * prices at `defaultSizeInBytes` (effectively infinite) and a join
  * against a tiny — or tinily-PRUNED — graft table never
  * auto-broadcasts. (The non-catalog v1 face is unaffected:
  * `GraftRelation.sizeInBytes` prices `LogicalRelation` directly.)
  *
  * Nor can an injected rule read the wrapped scan's estimate after the
  * fact: every optimizer extension hook (including `injectPreCBORule`)
  * runs BEFORE the "Early Filter and Projection Push-Down" batch, so
  * what a rule sees is the pre-pushdown [[DataSourceV2Relation]]. So
  * this rule re-derives the decision the planner would have made with
  * real numbers, from that shape: for each join side that is a
  * Project/Filter tree over ONE graft catalog table, translate the
  * side's predicates to source filters, price the partitions surviving
  * manifest/stats pruning ([[GraftTable.prunedBytes]], scaled to the
  * side's projected width), and when the result fits
  * `spark.sql.autoBroadcastJoinThreshold`, set that side's BROADCAST
  * join hint. Residual predicates only shrink the side further, so the
  * estimate is an upper bound. Infeasible hints (wrong join type for
  * that build side) are ignored by JoinSelection, user-supplied hints
  * are never overridden, and threshold ≤ 0 (broadcast disabled) leaves
  * every plan untouched — the rule can only flip a
  * shuffle-that-should-have-broadcast into the broadcast the stats
  * justify.
  */
object BroadcastStatsRule extends Rule[LogicalPlan] with PredicateHelper {

  /** Upper bound on the side's bytes, defined only when the side is a
    * Project/Filter tree over a single graft catalog table. None =
    * unknown — never hint. (Shared with [[JoinOrderRule]], which
    * compares sides by the same estimate.)
    */
  /** The side's single graft catalog table plus its predicates
    * translated to source filters, when the side IS a Project/Filter
    * tree over one ([[JoinOrderRule]] shares this peel for its row/NDV
    * pricing). None = not a graft side.
    */
  private[plans] def graftSideParts(side: LogicalPlan)
      : Option[(GraftTable, Array[sf.Filter])] = {
    def peel(p: LogicalPlan,
             preds: Seq[Expression]): Option[(DataSourceV2Relation, Seq[Expression])] =
      p match {
        case pr: Project => peel(pr.child, preds)
        case f: Filter => peel(f.child, preds ++ splitConjunctivePredicates(f.condition))
        case r: DataSourceV2Relation => Some((r, preds))
        case _ => None
      }
    peel(side, Nil).flatMap { case (rel, preds) =>
      rel.table match {
        case gt: GraftTable => Some((gt, preds.flatMap(toSourceFilter).toArray))
        case _ => None
      }
    }
  }

  private[plans] def graftSideBytes(side: LogicalPlan): Option[Long] = {
    def relOutput(p: LogicalPlan): Seq[Attribute] = p match {
      case pr: Project => relOutput(pr.child)
      case f: Filter => relOutput(f.child)
      case r: DataSourceV2Relation => r.output
      case _ => Nil
    }
    graftSideParts(side).map { case (gt, translated) =>
      val bytes = gt.prunedBytes(translated)
      // scale to the side's projected width (column pruning hasn't
      // reached the relation yet at this point in the optimizer)
      val fullW = relOutput(side).map(_.dataType.defaultSize).sum.max(1)
      val keptW = side.output.map(_.dataType.defaultSize).sum.max(1)
      if (keptW >= fullW) bytes
      else math.ceil(bytes.toDouble * keptW / fullW).toLong
    }
  }

  /** Catalyst predicate → source filter, for exactly the shapes the
    * manifest/stats pruner consumes (equality, IN, and comparisons
    * between a bare column and a literal — Spark's own translateFilter
    * is `protected[sql]`). Untranslatable predicates are skipped: fewer
    * filters means less pruning means a LARGER estimate, so skipping is
    * always conservative.
    */
  private def toSourceFilter(e: Expression): Option[sf.Filter] = {
    def scala(l: Literal): Any =
      CatalystTypeConverters.convertToScala(l.value, l.dataType)
    e match {
      case EqualTo(a: Attribute, l: Literal) => Some(sf.EqualTo(a.name, scala(l)))
      case EqualTo(l: Literal, a: Attribute) => Some(sf.EqualTo(a.name, scala(l)))
      case In(a: Attribute, vs) if vs.forall(_.isInstanceOf[Literal]) =>
        Some(sf.In(a.name, vs.map(v => scala(v.asInstanceOf[Literal])).toArray))
      case GreaterThan(a: Attribute, l: Literal) => Some(sf.GreaterThan(a.name, scala(l)))
      case GreaterThan(l: Literal, a: Attribute) => Some(sf.LessThan(a.name, scala(l)))
      case GreaterThanOrEqual(a: Attribute, l: Literal) => Some(sf.GreaterThanOrEqual(a.name, scala(l)))
      case GreaterThanOrEqual(l: Literal, a: Attribute) => Some(sf.LessThanOrEqual(a.name, scala(l)))
      case LessThan(a: Attribute, l: Literal) => Some(sf.LessThan(a.name, scala(l)))
      case LessThan(l: Literal, a: Attribute) => Some(sf.GreaterThan(a.name, scala(l)))
      case LessThanOrEqual(a: Attribute, l: Literal) => Some(sf.LessThanOrEqual(a.name, scala(l)))
      case LessThanOrEqual(l: Literal, a: Attribute) => Some(sf.GreaterThanOrEqual(a.name, scala(l)))
      case _ => None
    }
  }

  private def hinted(existing: Option[HintInfo], side: LogicalPlan,
                     threshold: Long): Option[HintInfo] =
    if (existing.exists(_.strategy.isDefined)) existing // user's call wins
    else graftSideBytes(side) match {
      case Some(bytes) if bytes <= threshold =>
        Some(existing.getOrElse(HintInfo()).copy(strategy = Some(BROADCAST)))
      case _ => existing
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan // broadcast disabled: hands off
    plan.transform {
      case j: Join =>
        val lh = hinted(j.hint.leftHint, j.left, threshold)
        val rh = hinted(j.hint.rightHint, j.right, threshold)
        if ((lh eq j.hint.leftHint) && (rh eq j.hint.rightHint)) j
        else j.copy(hint = j.hint.copy(leftHint = lh, rightHint = rh))
    }
  }
}
