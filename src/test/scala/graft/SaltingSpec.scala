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

  // ---- join-side salting ---------------------------------------------------

  test("salted replicate join equals the plain equi-join exactly (inner and left)") {
    // l_returnflag has 3 distinct values over ~6k rows — maximal key skew;
    // the build side carries per-key payload so mismatched replication or a
    // salt collision bug would change row content, not just counts
    val li = Tables.lineitem(spark, sf0001).select("l_orderkey", "l_linenumber",
      "l_returnflag", "l_quantity")
    val dim = Tables.lineitem(spark, sf0001)
      .groupBy("l_returnflag").agg(count(lit(1)).as("flag_n"))
    for (jt <- Seq("inner", "left")) {
      val plain = li.join(dim, Seq("l_returnflag"), jt)
        .orderBy("l_orderkey", "l_linenumber").collect().map(_.toString).toSeq
      val salted = Salting.saltedEquiJoin(li, dim, Seq("l_returnflag"),
        saltBy = Seq("l_orderkey", "l_linenumber"), nSalts = 8, joinType = jt)
        .orderBy("l_orderkey", "l_linenumber").collect().map(_.toString).toSeq
      assert(salted === plain, s"joinType=$jt")
    }
  }

  test("salting spreads a hot join key across reducers: max partition share drops") {
    val li = Tables.lineitem(spark, sf0001)
    val n = 8
    def maxShare(keys: Seq[org.apache.spark.sql.Column]): Double = {
      val sizes = li.repartition(n, keys: _*)
        .groupBy(spark_partition_id().as("p")).agg(count(lit(1)).as("c"))
        .collect().map(_.getLong(1))
      sizes.max.toDouble / sizes.sum
    }
    val unsalted = maxShare(Seq(col("l_returnflag")))
    val salted = maxShare(Seq(col("l_returnflag"),
      pmod(xxhash64(col("l_orderkey"), col("l_linenumber")), lit(8L))))
    // 3 distinct flags into 8 partitions: one reducer owns >=40% unsalted;
    // (flag × 8 salts) = 24 keys spread near-uniformly
    assert(unsalted >= 0.3, s"corpus no longer skewed? max share $unsalted")
    assert(salted <= unsalted / 1.5, s"salting did not spread: $salted vs $unsalted")
  }

  test("salted replicate join rejects build-preserving join types") {
    val li = Tables.lineitem(spark, sf0001)
    val dim = li.select("l_returnflag").distinct()
    intercept[IllegalArgumentException] {
      Salting.saltedEquiJoin(li, dim, Seq("l_returnflag"),
        saltBy = Seq("l_orderkey"), joinType = "right")
    }
  }
}
