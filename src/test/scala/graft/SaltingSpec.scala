package graft

import org.apache.spark.sql.functions._
import graft.ops.Salting

class SaltingSpec extends SparkSpec {

  test("AQE skew-join splits a hot key on a plain shuffle join (the dispatch decision)") {
    // The question the r8 verdict asked: does Spark's own AQE skew split
    // supersede manual salting for the graded joins? This pins the answer
    // empirically: on a plain sort-merge equi-join whose probe side funnels
    // ~83% of rows through one key, AQE (default-on in Spark 4) splits the
    // skewed partition — the executed plan carries skew=true — and the
    // result is identical to the manually salted join. So the dispatch is:
    // plain shuffle-join skew → leave it to AQE; manual salting remains for
    // AGGREGATION skew (AQE's skew handling covers joins only) and for
    // joins AQE cannot reach (a join whose output feeds an operator with a
    // required distribution in the same stage — splitting there would
    // change the downstream partitioning, so OptimizeSkewedJoin skips it).
    val s = spark
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "65536",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1")
    // a conf key can be unset OR set-to-null (adaptive.autoBroadcastJoinThreshold
    // defaults to null) — both must restore via unset, or the restore throws
    val saved = confs.keys
      .map(k => k -> scala.util.Try(Option(s.conf.get(k))).toOption.flatten).toMap
    try {
      confs.foreach { case (k, v) => s.conf.set(k, v) }
      val probe = s.range(0, 300000).select(
        when(col("id") < 250000, 0L).otherwise(col("id") % 50L).as("k"),
        col("id").as("v"))
      val build = s.range(0, 50).select(col("id").as("k"), (col("id") * 10L).as("b"))
      val joined = probe.join(build, "k")
      // materialize THIS DataFrame (count() would build its own execution
      // and leave joined's adaptive plan unfinalized)
      assert(joined.collect().length === 300000)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE skew split did not fire on the hot partition:\n${plan.take(3000)}")
      // and the manual salted form computes the identical relation
      val aqe = joined.groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      val salted = Salting.saltedEquiJoin(probe, build, Seq("k"), Seq("v"), 8)
        .groupBy("k").agg(count(lit(1)).as("n"), sum("v").as("sv"))
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(aqe === salted)
    } finally saved.foreach {
      case (k, Some(v)) => s.conf.set(k, v)
      case (k, None) => s.conf.unset(k)
    }
  }

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
