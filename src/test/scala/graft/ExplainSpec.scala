package graft

/** Plan-shape guard: the similarity join must not degrade to a cartesian
  * product / broadcast nested loop — its candidate join has equi keys
  * (block cols + token) that Catalyst must extract.
  */
class ExplainSpec extends SparkSpec {
  test("q36 candidate join is an equi join (no CartesianProduct/BNLJ)") {
    val plan = SparkEntry.queries("q36_jaccard_self_join")(spark, sf0001)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan.take(2000))
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan.take(2000))
  }
}
