package graft.plans

import org.apache.spark.sql.catalyst.expressions.{And, Attribute, AttributeSet, EqualNullSafe, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule

/** N-WAY JOIN REORDER for graft catalog tables — the consumer of the
  * engine's size/selectivity statistics that Spark's own cost-based
  * reorder cannot be: `CostBasedJoinReorder` needs catalog row counts
  * (`ANALYZE TABLE` into the session catalog), which a DSv2 V1-bridge
  * table never has, so multi-join SQL over graft tables executes in
  * WRITTEN order even when the written order joins two fact tables
  * first and the selective dimension last.
  *
  * The rule flattens a maximal chain of hint-free INNER joins into its
  * input relations and conjuncts, estimates every input's cardinality
  * in ONE currency — ROWS — and greedily rebuilds left-deep from the
  * cheapest pair, always joining next the connected input whose join
  * OUTPUT is estimated smallest. Output cardinality uses the textbook
  * NDV model the sidecars already store ([[graft.sources.TableStats
  * .columnStats]]):
  *
  *   |L ⋈k R|  ≈  |L| · |R| / max(ndv_L(k), ndv_R(k))
  *
  * with the owning side's ROW COUNT as the NDV fallback when no
  * sidecar evidence exists (the primary-key assumption: a distinct
  * build side makes the output ≈ the probe side — conservative for
  * reordering, since it never makes an unknown side look selective).
  * Row counts come from the same selectivity-priced estimate the
  * broadcast rule uses for graft sides ([[graft.sources.GraftTable
  * .prunedRows]] — manifest/stats pruning under the side's
  * predicates), and from `plan.stats` for non-graft sides,
  * WIDTH-NORMALIZED into rows (`sizeInBytes / rowWidth`) so the two
  * estimates compare in the same unit instead of manifest bytes
  * against Spark's overhead-inflated logical bytes.
  *
  * Safety gates — any failure keeps the written order:
  *  - every join in the chain is INNER with a condition and NO user
  *    hint (associativity/commutativity hold; hinted joins are opaque
  *    leaves, never reassociated);
  *  - at least one input is graft-priced (the rule stays out of plans
  *    it knows nothing about);
  *  - every step joins through at least one bridging conjunct — a
  *    disconnected input (implicit cross join) aborts the rewrite;
  *  - every conjunct must land on some rebuilt join, or the original
  *    plan is kept.
  *
  * The original output ORDER is restored with a Project, and each
  * intermediate join is pruned to the columns later stages consume
  * (the same moves as Spark's own ReorderJoin).
  */
object JoinOrderRule extends Rule[LogicalPlan] with PredicateHelper {

  private def enabled: Boolean =
    conf.getConfString("spark.graft.joinReorder.enabled", "true").toBoolean

  /** Greedy reorder is O(n²) in inputs; past this the chain is left
    * alone (a 12-way hand-written join is already a deliberate plan).
    */
  private val MaxLeaves = 12

  private def noHints(h: JoinHint): Boolean =
    h.leftHint.forall(_.strategy.isEmpty) &&
      h.rightHint.forall(_.strategy.isEmpty)

  private def eligible(j: Join): Boolean =
    j.joinType == Inner && j.condition.isDefined && noHints(j.hint)

  /** Peel the attribute-only Projects column pruning leaves between
    * consecutive joins — only when an eligible join continues below
    * (a Project over a base relation stays part of its leaf).
    */
  private def peel(p: LogicalPlan): LogicalPlan = p match {
    case pr @ Project(pl, _) if pl.forall(_.isInstanceOf[Attribute]) =>
      peel(pr.child) match {
        case j: Join if eligible(j) => j
        case _ => pr
      }
    case _ => p
  }

  /** Flatten the maximal eligible-join chain rooted at `p` into
    * (inputs, conjuncts).
    */
  private def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    peel(p) match {
      case j: Join if eligible(j) =>
        val (ll, lc) = flatten(j.left)
        val (rl, rc) = flatten(j.right)
        (ll ++ rl, lc ++ rc ++ splitConjunctivePredicates(j.condition.get))
      case other => (Seq(other), Nil)
    }

  /** Cardinality estimate in ROWS, and whether it is graft-priced. */
  private[graft] def leafRows(p: LogicalPlan): (Double, Boolean) =
    BroadcastStatsRule.graftSideParts(p).flatMap { case (gt, fs) =>
      gt.prunedRows(fs).map(r => (math.max(1.0, r.toDouble), true))
    }.getOrElse {
      val st = p.stats
      st.rowCount match {
        case Some(rc) => (math.max(1.0, rc.toDouble), false)
        case None =>
          // width-normalize logical bytes into rows: one currency,
          // and the per-row overhead inflation divides out
          val w = math.max(1, 8 + p.output.map(_.dataType.defaultSize).sum)
          (math.max(1.0, st.sizeInBytes.toDouble / w), false)
      }
    }

  /** NDV of a join-key attribute from its owning input's sidecars;
    * None = no evidence (callers fall back to the input's row count).
    */
  private def ndvOf(a: Attribute, leaves: Seq[LogicalPlan]): Option[Double] =
    leaves.find(_.outputSet.contains(a)).flatMap { leaf =>
      BroadcastStatsRule.graftSideParts(leaf).flatMap { case (gt, fs) =>
        gt.columnNdv(fs, a.name).map(_.toDouble)
      }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    if (!enabled) return plan
    plan.transformDown {
      case j: Join if eligible(j) =>
        try reorder(j).getOrElse(j)
        catch { // advisory: never fail a query over a cost estimate
          case scala.util.control.NonFatal(e) =>
            logWarning(s"graft join reorder skipped: $e")
            j
        }
    }
  }

  private def reorder(j: Join): Option[LogicalPlan] = {
    val (leaves, conjuncts) = flatten(j)
    if (leaves.length < 3 || leaves.length > MaxLeaves) return None
    // a non-deterministic conjunct evaluated at a different join level
    // would draw differently — written order is its semantics
    if (!conjuncts.forall(_.deterministic)) return None
    val priced = leaves.map(leafRows)
    if (!priced.exists(_._2)) return None // no graft evidence anywhere
    val rows: Map[LogicalPlan, Double] = leaves.zip(priced.map(_._1)).toMap
    val leafOf: Attribute => Option[LogicalPlan] =
      a => leaves.find(_.outputSet.contains(a))
    // memoized per reorder: sel() runs for every candidate step of the
    // greedy (O(n²·conjuncts)) and an NDV lookup walks manifest +
    // sidecar evidence — once per attribute is plenty
    val ndvCache = scala.collection.mutable.Map.empty[Attribute, Option[Double]]
    def ndvOfCached(a: Attribute): Option[Double] =
      ndvCache.getOrElseUpdate(a, ndvOf(a, leaves))

    // selectivity of one conjunct BRIDGING the accumulated side and the
    // incoming leaf: the NDV model for equi conjuncts, neutral (1.0)
    // for everything else — a pure theta join then estimates as a
    // cross, which correctly deprioritizes it
    def sel(c: Expression, curAttrs: AttributeSet, leaf: LogicalPlan): Double = {
      def split(x: Expression, y: Expression): Option[(Attribute, Attribute)] =
        (x, y) match {
          case (a: Attribute, b: Attribute)
              if curAttrs.contains(a) && leaf.outputSet.contains(b) =>
            Some((a, b))
          case (a: Attribute, b: Attribute)
              if leaf.outputSet.contains(a) && curAttrs.contains(b) =>
            Some((b, a))
          case _ => None
        }
      (c match {
        case EqualTo(x, y) => split(x, y)
        case EqualNullSafe(x, y) => split(x, y)
        case _ => None
      }) match {
        case Some((a, b)) =>
          val na = ndvOfCached(a)
            .getOrElse(leafOf(a).map(rows).getOrElse(1.0))
          val nb = ndvOfCached(b)
            .getOrElse(leafOf(b).map(rows).getOrElse(1.0))
          1.0 / math.max(1.0, math.max(na, nb))
        case None => 1.0
      }
    }

    // the estimated output of joining `leaf` into the accumulated set,
    // None when no conjunct bridges them (a cross step — never taken)
    def step(curRows: Double, curAttrs: AttributeSet,
             pending: Seq[Expression], leaf: LogicalPlan)
        : Option[(Double, Seq[Expression])] = {
      val avail = curAttrs ++ leaf.outputSet
      val applicable = pending.filter(_.references.subsetOf(avail))
      val bridges = applicable.exists(c =>
        c.references.intersect(leaf.outputSet).nonEmpty &&
          c.references.intersect(curAttrs).nonEmpty)
      if (!bridges) None
      else {
        val out = applicable.foldLeft(curRows * rows(leaf)) { (acc, c) =>
          acc * sel(c, curAttrs, leaf)
        }
        Some((math.max(1.0, out), pending.filterNot(applicable.contains)))
      }
    }

    // greedy: cheapest bridged pair first, then always the connected
    // leaf with the smallest estimated join output
    var best: Option[(Seq[LogicalPlan], Double, Seq[Expression])] = None
    for (i <- leaves.indices; k <- leaves.indices if i != k) {
      val li = leaves(i)
      step(rows(li), li.outputSet, conjuncts, leaves(k)).foreach {
        case (out, rest) =>
          if (best.forall(_._2 > out))
            best = Some((Seq(li, leaves(k)), out, rest))
      }
    }
    var (order, cur, pending) = best.getOrElse(return None)
    var curAttrs = AttributeSet(order.flatMap(_.output))
    var remaining = leaves.filterNot(order.contains)
    while (remaining.nonEmpty) {
      var pick: Option[(LogicalPlan, Double, Seq[Expression])] = None
      remaining.foreach { leaf =>
        step(cur, curAttrs, pending, leaf).foreach { case (out, rest) =>
          if (pick.forall(_._2 > out)) pick = Some((leaf, out, rest))
        }
      }
      val (leaf, out, rest) = pick.getOrElse(return None) // disconnected
      order :+= leaf
      cur = out
      pending = rest
      curAttrs ++= leaf.outputSet
      remaining = remaining.filterNot(_ eq leaf)
    }
    if (order == leaves) return None // written order already optimal

    // rebuild left-deep in the greedy order, attaching each conjunct at
    // the first join that covers it and pruning intermediates to what
    // later stages consume; a Project restores the original output
    var tree: LogicalPlan = order.head
    var toApply = conjuncts
    order.tail.foreach { leaf =>
      val avail = AttributeSet(tree.output) ++ leaf.outputSet
      val (use, rest) = toApply.partition(_.references.subsetOf(avail))
      if (use.isEmpty) return None // must never build a cross step
      toApply = rest
      tree = Join(tree, leaf, Inner, Some(use.reduceLeft(And)), JoinHint.NONE)
      val needed = AttributeSet(j.output) ++
        AttributeSet(rest.flatMap(_.references))
      val kept = tree.output.filter(needed.contains)
      if (kept.nonEmpty && kept.length < tree.output.length)
        tree = Project(kept, tree)
    }
    if (toApply.nonEmpty) return None // a conjunct failed to land
    logInfo(s"graft join reorder: ${leaves.length}-way chain rebuilt " +
      s"selective-first (est. final output ~${cur.toLong} rows)")
    Some(Project(j.output, tree))
  }
}
