package org.apache.spark.sql.classic

import org.apache.spark.sql.{Column, DataFrame, SparkSession => ApiSession}
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The two `private[sql]` hooks graft's lowered SQL DML commands need —
  * exposed through a package-located accessor, the standard extension
  * technique (Delta and Iceberg ship the same kind of bridge):
  *
  *  - a resolved [[LogicalPlan]] → [[DataFrame]] (the UPDATE/MERGE
  *    commands re-read their analyzed target/source plans as frames so
  *    one DataFrame pipeline serves SQL and Scala identically), and
  *  - a resolved catalyst [[Expression]] → [[Column]] (clause conditions
  *    and SET values re-addressed into the merge join).
  *
  * Nothing else crosses the boundary; keep it that way.
  */
object GraftBridge {

  def ofRows(spark: ApiSession, plan: LogicalPlan): DataFrame =
    Dataset.ofRows(spark.asInstanceOf[SparkSession], plan)

  def column(e: Expression): Column = ExpressionUtils.column(e)
}
