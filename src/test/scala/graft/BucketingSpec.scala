package graft

import org.apache.spark.sql.functions._
import graft.sources.Bucketing

/** Bucketed layout must make the equi-join exchange-free and preserve
  * results exactly.
  */
class BucketingSpec extends SparkSpec {

  test("bucketed-by-key join plans with zero exchanges and identical results") {
    val orders = Tables.orders(spark, sf0001)
    val customer = Tables.customer(spark, sf0001)
    Bucketing.writeBucketed(orders, "b_orders", Seq("o_custkey"), 8)
    Bucketing.writeBucketed(customer, "b_customer", Seq("c_custkey"), 8)

    val bo = spark.table("b_orders")
    val bc = spark.table("b_customer")
    // force the merge join (broadcast would hide the layout win)
    val joined = bo.hint("merge")
      .join(bc, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment")
      .agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment")

    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("SortMergeJoin"), plan.take(2000))
    // the join itself must not shuffle either side — the only exchange
    // allowed is the post-join aggregation's
    val joinSection = plan.substring(plan.indexOf("SortMergeJoin"))
    assert(!joinSection.contains("Exchange hashpartitioning"), joinSection.take(2000))

    val direct = orders.join(customer, col("o_custkey") === col("c_custkey"))
      .groupBy("c_mktsegment").agg(count(lit(1)).as("n"))
      .orderBy("c_mktsegment").collect().map(_.toString).toSeq
    assert(joined.collect().map(_.toString).toSeq === direct)
  }
}
