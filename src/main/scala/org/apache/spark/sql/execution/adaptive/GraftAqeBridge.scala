package org.apache.spark.sql.execution.adaptive

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{HashedRelation, HashedRelationBroadcastMode, HashJoin, LongHashedRelation}
import org.apache.spark.sql.types.{AtomicType, DataType}

/** The AQE internals graft's runtime-filter rule needs, exposed through
  * a package-located accessor (the same technique as
  * [[org.apache.spark.sql.classic.GraftBridge]] — Delta and Iceberg
  * ship equivalents): recognizing a MATERIALIZED broadcast query stage
  * inside the runtime-optimizer's logical plan, and extracting the
  * distinct values (or, over budget, the [min, max] bounds) of one key
  * column of the [[HashedRelation]] it was built over. Nothing else
  * crosses the boundary.
  *
  * Extraction mirrors Spark's own `SubqueryBroadcastExec` (the DPP
  * executor): iterate `HashedRelation.keys()`, unpack via
  * [[HashJoin.extractKeyExprAt]] for the packed-long relation or a
  * [[BoundReference]] otherwise, project, convert to Scala values.
  */
object GraftAqeBridge {

  /** A broadcast build side's key evidence for ONE key column, in
    * decreasing exactness: the distinct non-null values when they fit
    * the exact budget ([[KeySet]]); the full distinct set PLUS its
    * bounds when they fit only the extended budget ([[KeyEvidence]] —
    * the scan probes bloom sidecars per key with local hashing, and
    * tests interval evidence with the bounds); just the [min, max]
    * bounds beyond that ([[KeyRange]] — still prunes min/max sidecar
    * envelopes at any key count, the Delta/Iceberg min-max DPP
    * fallback).
    */
  sealed trait BroadcastKeys
  final case class KeySet(values: Seq[Any]) extends BroadcastKeys
  final case class KeyEvidence(values: Seq[Any],
                               bounds: Option[(Any, Any)]) extends BroadcastKeys
  final case class KeyRange(min: Any, max: Any) extends BroadcastKeys

  /** The side's materialized broadcast stage, when the side IS one —
    * the runtime rule matches a join child directly (AQE substitutes
    * [[LogicalQueryStage]] exactly where the exchange sat, so the key
    * set is the join's own build side, never a sub-plan's).
    */
  def materializedBroadcastStage(side: LogicalPlan): Option[SparkPlan] =
    side match {
      case lqs: LogicalQueryStage => lqs.physicalPlan match {
        case s: BroadcastQueryStageExec if s.isMaterialized => Some(s)
        case _ => None
      }
      case _ => None
    }

  /** Whether the stage's broadcast is an ADDRESSABLE hash relation for
    * a build side whose ORIGINAL key types are `keyTypes` (in extraction
    * order) — either the mode carries one key per original key with
    * matching types, or [[org.apache.spark.sql.execution.joins.HashJoin
    * .rewriteKeyExpr]] PACKED several integral keys into one long
    * ([[HashJoin.extractKeyExprAt]] unpacks by the original types'
    * widths). Null-aware modes are rejected.
    */
  def addressableHashMode(stage: SparkPlan,
                          keyTypes: Seq[DataType]): Boolean = stage match {
    case s: BroadcastQueryStageExec if s.isMaterialized =>
      modeOf(s).exists {
        case HashedRelationBroadcastMode(keys, false) =>
          (keys.length == keyTypes.length &&
            keys.map(_.dataType) == keyTypes) || packed(keys, keyTypes)
        case _ => false
      }
    case _ => false
  }

  /** The rewriteKeyExpr signature: integral original key(s) rewritten
    * into ONE long mode key — several keys bit-packed within 8 bytes,
    * or a LONE int/short/byte/long (the most common dim-join key shape)
    * upcast to long. `HashJoin.extractKeyExprAt` unpacks both: by bit
    * offset for the multi-key layout, a plain narrowing Cast for the
    * single-key one.
    */
  private def packed(modeKeys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
                     keyTypes: Seq[DataType]): Boolean = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    def integral(t: DataType): Boolean =
      t == ByteType || t == ShortType || t == IntegerType || t == LongType
    modeKeys.length == 1 && modeKeys.head.dataType == LongType &&
      keyTypes.nonEmpty && keyTypes.forall(integral) &&
      keyTypes.map(_.defaultSize).sum <= 8
  }

  private def modeOf(s: BroadcastQueryStageExec) = (s.broadcast: SparkPlan) match {
    case b: BroadcastExchangeExec => Some(b.mode)
    case ReusedExchangeExec(_, b: BroadcastExchangeExec) => Some(b.mode)
    case _ => None
  }

  /** Distinct non-null values of ORIGINAL key column `index` of a
    * materialized broadcast hash-join stage whose build keys had
    * `keyTypes` — [[KeySet]] up to `maxKeys` distinct values,
    * [[KeyEvidence]] (values + bounds) up to `hardMaxKeys`,
    * [[KeyRange]] beyond that (orderable types only), None when the
    * stage isn't an addressable hash broadcast of those types
    * ([[addressableHashMode]]).
    */
  def broadcastKeyValuesAt(stage: SparkPlan, index: Int,
                           keyTypes: Seq[DataType],
                           maxKeys: Int,
                           hardMaxKeys: Int): Option[BroadcastKeys] = stage match {
    case s: BroadcastQueryStageExec
        if addressableHashMode(stage, keyTypes) && index < keyTypes.length =>
      // the mode key differs from the original keys exactly when
      // rewriteKeyExpr packed/upcast them into one long — that layout
      // is only addressable through the long relation's key rows
      val rewritten = modeOf(s).exists {
        case HashedRelationBroadcastMode(keys, _) =>
          keys.length == 1 && keys.map(_.dataType) != keyTypes
        case _ => false
      }
      s.resultOption.get() match {
        case Some(bc: Broadcast[_]) => bc.value match {
          case hr: HashedRelation =>
            if (rewritten && !hr.isInstanceOf[LongHashedRelation])
              None // rewritten mode implies the long layout; anything
                   // else would be addressed wrongly — stay out
            else extract(hr, keyTypes, index, maxKeys,
              math.max(maxKeys, hardMaxKeys))
          case _ => None
        }
        case _ => None
      }
    case _ => None
  }

  private def extract(hr: HashedRelation, keyTypes: Seq[DataType],
                      index: Int, maxKeys: Int,
                      hardMaxKeys: Int): Option[BroadcastKeys] = {
    val dt = keyTypes(index)
    // placeholders carry the TYPES extractKeyExprAt computes bit
    // offsets from; the long relation's key rows hold one (packed) long
    val placeholders = keyTypes.map(t => BoundReference(0, t, nullable = true))
    val expr = hr match {
      case _: LongHashedRelation =>
        HashJoin.extractKeyExprAt(placeholders, index)
      case _ => BoundReference(index, dt, nullable = true)
    }
    val proj = UnsafeProjection.create(Seq(expr))
    val conv = CatalystTypeConverters.createToScalaConverter(dt)
    val ordering: Option[Ordering[Any]] = dt match {
      case _: AtomicType =>
        scala.util.Try(TypeUtils.getInterpretedOrdering(dt)).toOption
      case _ => None
    }
    val out = scala.collection.mutable.LinkedHashSet.empty[Any]
    var lo: Any = null
    var hi: Any = null
    var overBudget = false
    val it = hr.keys()
    while (it.hasNext) {
      // COPY the projected row: UnsafeProjection reuses its buffer, and
      // the bounds below hold values across iterator steps (same move
      // as SubqueryBroadcastExec's .map(_.copy()))
      val r = proj(it.next()).copy()
      if (!r.isNullAt(0)) {
        val v = r.get(0, dt)
        ordering.foreach { ord =>
          if (lo == null || ord.lt(v, lo)) lo = v
          if (hi == null || ord.gt(v, hi)) hi = v
        }
        if (!overBudget) {
          out += conv(v)
          if (out.size > hardMaxKeys) {
            if (ordering.isEmpty) return None // no fallback possible
            overBudget = true
            out.clear() // bounds carry the evidence from here
          }
        }
      }
    }
    def bounds: Option[(Any, Any)] =
      if (lo == null) None else Some((conv(lo), conv(hi)))
    if (!overBudget) {
      if (out.size <= maxKeys) Some(KeySet(out.toSeq))
      else Some(KeyEvidence(out.toSeq, bounds))
    } else bounds.map { case (l, h) => KeyRange(l, h) }
  }
}
