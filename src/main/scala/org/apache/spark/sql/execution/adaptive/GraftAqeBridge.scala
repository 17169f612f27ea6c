package org.apache.spark.sql.execution.adaptive

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{BoundReference, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.{BroadcastExchangeExec, ReusedExchangeExec}
import org.apache.spark.sql.execution.joins.{HashedRelation, HashedRelationBroadcastMode, HashJoin, LongHashedRelation}
import org.apache.spark.sql.types.DataType

/** The AQE internals graft's runtime-filter rule needs, exposed through
  * a package-located accessor (the same technique as
  * [[org.apache.spark.sql.classic.GraftBridge]] — Delta and Iceberg
  * ship equivalents): recognizing a MATERIALIZED broadcast query stage
  * inside the runtime-optimizer's logical plan, and extracting the
  * distinct key values its [[HashedRelation]] was built over. Nothing
  * else crosses the boundary.
  *
  * Extraction mirrors Spark's own `SubqueryBroadcastExec` (the DPP
  * executor): iterate `HashedRelation.keys()`, unpack via
  * [[HashJoin.extractKeyExprAt]] for the packed-long relation or a
  * [[BoundReference]] otherwise, project, convert to Scala values.
  */
object GraftAqeBridge {

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

  /** Distinct, non-null single-key values of a materialized broadcast
    * hash-join stage — None unless the stage broadcasts a NON-null-aware
    * [[HashedRelationBroadcastMode]] over exactly ONE key of
    * `expectedType` (the type gate pins the mode's key to the join-side
    * attribute the caller matched) with at most `maxKeys` distinct
    * values. The cap is the fallback-to-full-scan budget: a huge build
    * side stops paying for per-value pruning long before it stops being
    * correct.
    */
  def broadcastSingleKeyValues(stage: SparkPlan, expectedType: DataType,
                               maxKeys: Int): Option[Seq[Any]] = stage match {
    case s: BroadcastQueryStageExec if s.isMaterialized =>
      val mode = (s.broadcast: SparkPlan) match {
        case b: BroadcastExchangeExec => Some(b.mode)
        case ReusedExchangeExec(_, b: BroadcastExchangeExec) => Some(b.mode)
        case _ => None
      }
      mode match {
        case Some(HashedRelationBroadcastMode(keys, false))
            if keys.length == 1 && keys.head.dataType == expectedType =>
          s.resultOption.get() match {
            case Some(bc: Broadcast[_]) => bc.value match {
              case hr: HashedRelation => extract(hr, keys, maxKeys)
              case _ => None
            }
            case _ => None
          }
        case _ => None
      }
    case _ => None
  }

  private def extract(
      hr: HashedRelation,
      keys: Seq[org.apache.spark.sql.catalyst.expressions.Expression],
      maxKeys: Int): Option[Seq[Any]] = {
    val dt = keys.head.dataType
    val expr = hr match {
      case _: LongHashedRelation => HashJoin.extractKeyExprAt(keys, 0)
      case _ => BoundReference(0, dt, keys.head.nullable)
    }
    val proj = UnsafeProjection.create(Seq(expr))
    val conv = CatalystTypeConverters.createToScalaConverter(dt)
    val out = scala.collection.mutable.LinkedHashSet.empty[Any]
    val it = hr.keys()
    while (it.hasNext) {
      val r = proj(it.next())
      if (!r.isNullAt(0)) {
        out += conv(r.get(0, dt))
        if (out.size > maxKeys) return None // over budget: full scan
      }
    }
    Some(out.toSeq)
  }
}
