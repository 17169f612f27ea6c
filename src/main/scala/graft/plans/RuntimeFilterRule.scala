package graft.plans

import org.apache.spark.sql.catalyst.expressions.{AttributeReference, EqualTo, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.{Cross, Inner, JoinType, LeftOuter, LeftSemi, RightOuter}
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.adaptive.GraftAqeBridge
import org.apache.spark.sql.execution.datasources.v2.{DataSourceV2ScanRelation, GraftV2Bridge}
import org.apache.spark.sql.{sources => sf}

import graft.sources.GraftV1Scan

/** RUNTIME FILTERING for graft scans — the dynamic-partition-pruning
  * analog every lakehouse reader ships: when a broadcast hash join's
  * build side has materialized, push its key set into the probe-side
  * graft scan so manifest entries (and their files) the join cannot
  * match are never read. At 100 TB this is the single largest read-path
  * multiplier a selective dimension join has: the static pushdown
  * halves (per-file blooms, min/max sidecars, partition mapping) all
  * exist, but a `dim JOIN fact ON key WHERE dim.x = …` query learns the
  * surviving keys only at EXECUTION time.
  *
  * Delivery: Spark's own `PartitionPruning` injection cannot reach a
  * V1-bridge scan (`V1ScanWrapper` implements no runtime-filtering
  * interface — verified against Spark 4.1.2), so this rule rides AQE's
  * runtime re-optimization instead (`injectRuntimeOptimizerRule`): each
  * time a query stage materializes, AQE re-optimizes the logical plan
  * with completed stages substituted in. The rule matches a join whose
  * one side IS a materialized broadcast stage and whose other side is a
  * Project/Filter tree over a graft catalog scan, extracts the
  * broadcast [[org.apache.spark.sql.execution.joins.HashedRelation]]'s
  * distinct per-key-column values ([[GraftAqeBridge]], the same extraction
  * Spark's `SubqueryBroadcastExec` performs for DPP), and hands them to
  * the scan's STANDARD `SupportsRuntimeFiltering.filter` face as an
  * `IN` filter ([[GraftV1Scan.filter]]). AQE then replans the final
  * stage over the re-pruned scan — same shuffle count, different plan,
  * adopted.
  *
  * Multi-key equi joins filter PER COLUMN — sound, because a probe row
  * whose value for ANY key column appears in no build row cannot match;
  * the per-column sets are a cartesian superset of the true key tuples.
  * Key extraction replicates `ExtractEquiJoinKeys`' conjunct order
  * exactly (the HashedRelation's key rows are addressed by index), with
  * the bridge validating the broadcast mode against the original key
  * types — `HashJoin.rewriteKeyExpr`'s packed-long layout included.
  *
  * Soundness gates (every reject degrades to the unfiltered scan):
  *  - join types where pruning the probe side cannot drop an output
  *    row: Inner/Cross both sides, LeftSemi/RightOuter the left,
  *    LeftOuter the right;
  *  - the keyish-conjunct list must be addressable against the
  *    broadcast mode ([[GraftAqeBridge.addressableHashMode]]) — any
  *    count/type mismatch means the physical key order can't be
  *    trusted, and the rule stays out;
  *  - filters land only on bare scan-output attributes of columns the
  *    scan can actually prune ([[graft.sources.GraftRelation
  *    .runtimeFilterable]]: partition column, hidden-transform source,
  *    stats/bloom-annotated);
  *  - a TWO-TIER key-count budget. Up to `spark.graft.runtimeFilter
  *    .maxKeys` (default 1024) the key set lands as a plain `IN` —
  *    exact per-value pruning at every grain (partition map, hidden
  *    transforms, intervals, blooms). Up to `spark.graft.runtimeFilter
  *    .bloomMaxKeys` (default 131072) the FULL set still lands (plus
  *    its [min, max] bounds): the scan probes bloom sidecars per key
  *    with driver-local hashing ([[graft.sources.DataSkipping
  *    .localPositions]]) and tests interval evidence with the bounds —
  *    which is what keeps a 10^5-key dimension join pruning FILES on a
  *    value-interleaved layout, where bounds alone prune nothing.
  *    Beyond that, [min, max] bounds only (orderable types), or the
  *    full scan when no ordering exists.
  */
object RuntimeFilterRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.runtimeFilter.enabled", "true").toBoolean
  private def maxKeys: Int =
    conf.getConfString("spark.graft.runtimeFilter.maxKeys", "1024").toInt
  private def bloomMaxKeys: Int =
    conf.getConfString("spark.graft.runtimeFilter.bloomMaxKeys",
      (1 << 17).toString).toInt

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    try plan.transformUp {
      case j: Join if j.condition.isDefined =>
        var out = j
        if (pruneLeftSound(out.joinType))
          out = tryFilter(out, scanOnLeft = true)
        if (pruneRightSound(out.joinType))
          out = tryFilter(out, scanOnLeft = false)
        out
    } catch {
      // runtime filtering is advisory: a failure to inject must never
      // fail the query — AQE keeps the current (correct) plan
      case scala.util.control.NonFatal(e) =>
        logWarning(s"graft runtime filter injection skipped: $e")
        plan
    }
  }

  /** Pruning LEFT rows that have no right-side match is sound when the
    * output keeps no unmatched left row.
    */
  private def pruneLeftSound(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftSemi | RightOuter => true
    case _ => false
  }

  /** Pruning RIGHT rows that have no left-side match. */
  private def pruneRightSound(jt: JoinType): Boolean = jt match {
    case Inner | Cross | LeftOuter => true
    case _ => false
  }

  /** The scan side's graft V1 scan, peeled through the Project/Filter
    * nodes the optimizer leaves above a pushed scan — None when the
    * side isn't a single graft catalog scan, or a runtime filter
    * already landed (idempotence across AQE's repeated re-optimizations).
    */
  private def scanTarget(side: LogicalPlan)
      : Option[(DataSourceV2ScanRelation, GraftV1Scan)] = side match {
    case p: Project => scanTarget(p.child)
    case f: Filter => scanTarget(f.child)
    case r: DataSourceV2ScanRelation =>
      GraftV2Bridge.unwrap(r.scan) match {
        case Some(gs: GraftV1Scan) if gs.runtime.isEmpty => Some((r, gs))
        case _ => None
      }
    case _ => None
  }

  private def canEval(e: org.apache.spark.sql.catalyst.expressions.Expression,
                      p: LogicalPlan): Boolean =
    e.references.nonEmpty && e.references.subsetOf(p.outputSet)

  private def tryFilter(j: Join, scanOnLeft: Boolean): Join = {
    val (scanSide, stageSide) =
      if (scanOnLeft) (j.left, j.right) else (j.right, j.left)
    val stage = GraftAqeBridge.materializedBroadcastStage(stageSide)
      .getOrElse(return j)
    val (scanRel, gs) = scanTarget(scanSide).getOrElse(return j)
    // the conjuncts ExtractEquiJoinKeys turned into build keys, IN ORDER
    // — indexing into the HashedRelation's key rows is only sound when
    // this list reproduces that extraction exactly: plain `=` and `<=>`
    // whose sides split cleanly between the join's children become
    // keys; everything else is a residual. A `<=>` key (Coalesce-
    // wrapped in the mode, same type) is COUNTED but never filtered on.
    // Each entry carries the STAGE side's key type — what the bridge
    // validates against the broadcast mode, packed-long layout included.
    val keyish: Seq[(org.apache.spark.sql.types.DataType,
        Option[(AttributeReference)])] =
      splitConjunctivePredicates(j.condition.get).flatMap {
        case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r)
            if canEval(l, scanSide) && canEval(r, stageSide) =>
          Some((r.dataType, l match {
            case a: AttributeReference => Some(a)
            case _ => None
          }))
        case org.apache.spark.sql.catalyst.expressions.EqualTo(l, r)
            if canEval(l, stageSide) && canEval(r, scanSide) =>
          Some((l.dataType, r match {
            case a: AttributeReference => Some(a)
            case _ => None
          }))
        case org.apache.spark.sql.catalyst.expressions.EqualNullSafe(l, r)
            if (canEval(l, scanSide) && canEval(r, stageSide)) ||
              (canEval(l, stageSide) && canEval(r, scanSide)) =>
          Some((l.dataType, None))
        case _ => None
      }
    if (keyish.isEmpty) return j
    val dimTypes = keyish.map(_._1)
    // the broadcast mode must be addressable for EXACTLY these key
    // types (pairwise, or rewriteKeyExpr's packed-long layout) — any
    // mismatch means the physical key order can't be trusted: stay out
    if (!GraftAqeBridge.addressableHashMode(stage, dimTypes)) return j
    val filterable = gs.relation.runtimeFilterable.toSet
    val budget = maxKeys
    val hardBudget = bloomMaxKeys
    val rfs: Seq[sf.Filter] = keyish.zipWithIndex.flatMap {
      case ((_, Some(sk)), i)
          if scanRel.outputSet.contains(sk) && filterable(sk.name) =>
        GraftAqeBridge.broadcastKeyValuesAt(stage, i, dimTypes, budget,
          hardBudget)
          .toSeq.flatMap {
            case GraftAqeBridge.KeySet(vs) =>
              Seq(sf.In(sk.name, vs.toArray))
            case GraftAqeBridge.KeyEvidence(vs, bounds) =>
              // over the exact budget, within the extended one: the
              // full set still lands (bloom sidecars probe it per key
              // with local hashing) alongside its bounds (interval
              // evidence tests those instead of 10^5 values)
              sf.In(sk.name, vs.toArray) +: bounds.toSeq.flatMap {
                case (lo, hi) => Seq(sf.GreaterThanOrEqual(sk.name, lo),
                  sf.LessThanOrEqual(sk.name, hi))
              }
            case GraftAqeBridge.KeyRange(lo, hi) =>
              // over both budgets: the keys' [min, max] still prunes
              // through the min/max sidecar envelopes at ANY key count
              Seq(sf.GreaterThanOrEqual(sk.name, lo),
                sf.LessThanOrEqual(sk.name, hi))
          }
      case _ => Nil
    }
    if (rfs.isEmpty) return j
    val fresh = new GraftV1Scan(gs.relation, gs.required, gs.pushed)
    fresh.filter(rfs.toArray)
    if (fresh.runtime.isEmpty) return j // scan declined: keep full plan
    val rewrapped = GraftV2Bridge.rewrap(scanRel.scan, fresh)
    val newScanSide = scanSide.transformUp {
      case r: DataSourceV2ScanRelation if r.scan eq scanRel.scan =>
        r.copy(scan = rewrapped)
    }
    logInfo(s"graft runtime filter: ${rfs.length} filter(s) " +
      s"[${rfs.map { case f: sf.In => s"${f.attribute} IN(${f.values.length})"
        case f => f.toString.take(40) }.mkString(", ")}] " +
      s"pushed into ${gs.relation.root}")
    if (scanOnLeft) j.copy(left = newScanSide) else j.copy(right = newScanSide)
  }
}
