package graft

import org.apache.spark.sql.functions._
import graft.ops.Salting

class SaltingSpec extends SparkSpec {

  test("salted two-phase sum equals the direct aggregation exactly") {
    val li = Tables.lineitem(spark, sf0001)
    val direct = li.groupBy("l_returnflag")
      .agg(Det.exactSum(col("l_quantity")).as("sum_val"), count(lit(1)).as("n"))
      .orderBy("l_returnflag")
      .collect().map(_.toString).toSeq
    val salted = Salting.saltedSumCount(
      li, Seq("l_returnflag"), "l_quantity", saltBy = Seq("l_orderkey"), nSalts = 16)
      .orderBy("l_returnflag")
      .collect().map(_.toString).toSeq
    assert(salted === direct)
  }

  test("salting is deterministic across runs") {
    def run() = Salting.saltedSumCount(
      Tables.lineitem(spark, sf0001), Seq("l_returnflag", "l_linestatus"),
      "l_extendedprice", saltBy = Seq("l_orderkey", "l_linenumber"), nSalts = 8)
      .orderBy("l_returnflag", "l_linestatus").collect().map(_.toString).toSeq
    assert(run() === run())
  }

  test("plan shape: two aggregation exchanges, hot key spread over salts") {
    val df = Salting.saltedSumCount(
      Tables.lineitem(spark, sf0001), Seq("l_returnflag"), "l_quantity",
      saltBy = Seq("l_orderkey"), nSalts = 16)
    val plan = df.queryExecution.executedPlan.toString
    assert("Exchange hashpartitioning".r.findAllIn(plan).size >= 2, plan.take(2000))
  }
}
