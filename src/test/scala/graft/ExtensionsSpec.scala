package graft

import org.apache.spark.sql.functions._

/** The optimizer extension must rewrite the HOF dot-product idiom into the
  * native codegen'd expression — same results, faster plan — and must leave
  * non-matching aggregates alone.
  */
class ExtensionsSpec extends SparkSpec {

  private def hofDot = Tables.embeddings(spark, sf0001)
    .select(col("vec_id"), col("embedding").cast("array<double>").as("v"))
    .limit(50)
    .select(col("vec_id"),
      aggregate(zip_with(col("v"), col("v"), (x, y) => x * y),
        lit(0.0), (acc, x) => acc + x).as("dp"))

  test("aggregate(zip_with(*, *), 0.0, +) is rewritten to graft_dot") {
    val optimized = hofDot.queryExecution.optimizedPlan.toString
    assert(optimized.contains("graft_dot"), optimized.take(1500))
    assert(!optimized.contains("aggregate("), optimized.take(1500))
  }

  test("rewrite preserves values (unit vectors: self-dot == 1)") {
    val dps = hofDot.collect().map(_.getDouble(1))
    assert(dps.length === 50)
    assert(dps.forall(d => math.abs(d - 1.0) < 1e-6), dps.take(5).mkString(","))
  }

  test("non-dot aggregates are left untouched") {
    val sumAgg = Tables.embeddings(spark, sf0001)
      .select(col("embedding").cast("array<double>").as("v")).limit(5)
      .select(aggregate(col("v"), lit(0.0), (acc, x) => acc + x).as("s"))
    val optimized = sumAgg.queryExecution.optimizedPlan.toString
    assert(!optimized.contains("graft_dot"), optimized.take(1500))
    assert(sumAgg.collect().length === 5)
  }
}
