package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.ops.Curation

/** [[graft.ops.Curation.tokenBudgetSelect]] exists so the q139 selection
  * can survive one pathologically large key; its contract is EXACT equality
  * with the direct per-key cumulative-window greedy. These tests pin that
  * equality — on the real corpus and on adversarial shapes the corpus
  * doesn't exhibit (score ties crossing the budget frontier, a bucket that
  * exactly exhausts the budget, single-doc keys).
  */
class CurationSpec extends SparkSpec {

  /** The direct formulation (q139's shape): one per-key window. */
  private def directGreedy(docs: org.apache.spark.sql.DataFrame,
                           num: Int, den: Int): org.apache.spark.sql.DataFrame = {
    val wCum = Window.partitionBy("k").orderBy(col("score").desc, col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("graft_cum", sum(col("tok")).over(wCum))
      .withColumn("graft_tot", sum(col("tok")).over(Window.partitionBy("k")))
      .filter(col("graft_cum") * den <= col("graft_tot") * num)
      .drop("graft_cum", "graft_tot")
  }

  private def assertSameSelection(docs: org.apache.spark.sql.DataFrame,
                                  num: Int, den: Int): Unit = {
    val expected = directGreedy(docs, num, den)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    val got = Curation.tokenBudgetSelect(docs, "k", "id", "score", "tok", num, den)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === expected,
      s"bucket-phase selection diverged: missing=${expected -- got}, extra=${got -- expected}")
  }

  test("equals the direct greedy on the real corpus (q139's scoring, both SF dirs)") {
    for (dir <- Seq(sf0001, sf001)) {
      val docs = Tables.documents(spark, dir)
        .filter(length(col("text")) > 0)
        .select(col("lang").as("k"), col("doc_id").as("id"),
          size(split(col("text"), " +")).cast("long").as("tok"),
          expr("CAST(length(regexp_replace(text, '[^a-zA-Z]', '')) AS BIGINT)" +
            " * 1000000 DIV n_chars").as("score"))
      assertSameSelection(docs, 1, 2)
      assertSameSelection(docs, 1, 10) // a tight budget exercises tiny frontiers
    }
  }

  test("score ties crossing the frontier, exact-fit buckets, and singleton keys") {
    import spark.implicits._
    val rows =
      // key "a": one score class of 6 docs × 10 tokens straddles a 50%
      // budget of 30 — greedy keeps ids 1,2,3 only (id tie-break INSIDE
      // the boundary bucket)
      (1L to 6L).map(i => ("a", i, 10L, 100L)) ++
        // key "b": bucket boundaries align exactly with the budget —
        // score 9 (20 tok) + score 8 (10 tok) == 50% of 60 exactly; the
        // next bucket must be rejected whole
        Seq(("b", 1L, 20L, 9L), ("b", 2L, 10L, 8L),
          ("b", 3L, 10L, 7L), ("b", 4L, 20L, 6L)) ++
        // key "c": a single doc is always more than half its own tokens
        Seq(("c", 1L, 5L, 3L)) ++
        // key "d": descending-score spread with varied sizes
        Seq(("d", 1L, 7L, 50L), ("d", 2L, 3L, 40L), ("d", 3L, 9L, 40L),
          ("d", 4L, 1L, 30L), ("d", 5L, 2L, 20L))
    val docs = rows.toDF("k", "id", "tok", "score").repartition(7)
    assertSameSelection(docs, 1, 2)
    assertSameSelection(docs, 3, 4)
    assertSameSelection(docs, 0, 1) // zero budget selects nothing
    // and the hand-computed expectations for the documented cases:
    val half = Curation.tokenBudgetSelect(docs, "k", "id", "score", "tok", 1, 2)
      .select("k", "id").collect().map(r => (r.getString(0), r.getLong(1))).toSet
    assert(half.filter(_._1 == "a") === Set(("a", 1L), ("a", 2L), ("a", 3L)))
    assert(half.filter(_._1 == "b") === Set(("b", 1L), ("b", 2L)))
    assert(!half.exists(_._1 == "c"))
  }

  test("one giant key: 100k docs, bounded score cardinality — the case this operator exists for") {
    import spark.implicits._
    // a single key holding the whole corpus: the direct form funnels all
    // 100k rows through one task's sort; the bucket form's windows see at
    // most 1,001 distinct-score rows and one boundary bucket (~100 docs)
    val docs = spark.range(100000).select(
      lit("en").as("k"),
      col("id"),
      (pmod(col("id") * 7919, lit(97)) + 1).cast("long").as("tok"),
      pmod(col("id") * 104729, lit(1001)).as("score"))
    val expected = directGreedy(docs, 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    val got = Curation.tokenBudgetSelect(docs, "k", "id", "score", "tok", 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got.size > 40000, s"half the tokens should select roughly half the docs: ${got.size}")
    assert(got === expected,
      s"diverged on the giant key: missing=${(expected -- got).take(5)}, extra=${(got -- expected).take(5)}")
  }

  test("null key/score rows are excluded from selection AND budget totals") {
    import spark.implicits._
    // lang "a": 4 docs of 10 tokens + one NULL-score doc of 100 tokens.
    // If the null row counted toward the total (250 half-budget = 70),
    // all four real docs would fit; excluded, the budget is 20 → 2 docs.
    val docs = Seq(
      ("a", 1L, 10L, Some(9L)), ("a", 2L, 10L, Some(8L)),
      ("a", 3L, 10L, Some(7L)), ("a", 4L, 10L, Some(6L)),
      ("a", 5L, 100L, None))
      .toDF("k", "id", "tok", "score")
    val got = Curation.tokenBudgetSelect(docs, "k", "id", "score", "tok", 1, 2)
      .select("id").collect().map(_.getLong(0)).toSet
    assert(got === Set(1L, 2L), s"null row must not shift the frontier: $got")
  }

  test("boundary window only ever sorts ONE bucket's docs (plan shape)") {
    import spark.implicits._
    val docs = (1L to 100L).map(i => ("k", i, 1L, i % 10))
      .toDF("k", "id", "tok", "score")
    val plan = Curation.tokenBudgetSelect(docs, "k", "id", "score", "tok")
      .queryExecution.executedPlan.toString
    // both windows exist, and every per-doc windowspec partitions by
    // (k, score) — the boundary bucket — never by k alone over all docs
    val specs = "windowspecdefinition\\(k#\\d+[^)]*\\)".r.findAllIn(plan).toSeq
    assert(specs.nonEmpty)
    val perDoc = specs.filter(_.contains("id#"))
    assert(perDoc.forall(_.contains("score#")),
      s"per-doc window must be bucket-scoped:\n$specs")
  }
}
