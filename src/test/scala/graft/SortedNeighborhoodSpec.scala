package graft

import org.apache.spark.sql.functions._
import graft.ops.SortedNeighborhood

/** The distributed sorted-neighborhood must emit EXACTLY the pair set of
  * the single-ORDER-BY window form — including pairs that straddle range-
  * partition boundaries — at any partition count, with runt partitions.
  */
class SortedNeighborhoodSpec extends SparkSpec {
  import spark.implicits._

  private def naivePairs(df: org.apache.spark.sql.DataFrame, w: Int): Set[(Long, Long, Int)] = {
    // oracle: global sort on the driver (test-scale only)
    val rows = df.orderBy("name", "key").select("key").as[Long].collect()
    (for {
      i <- rows.indices
      d <- 1 to w
      if i + d < rows.length
    } yield (rows(i), rows(i + d), d)).toSet
  }

  private def opPairs(df: org.apache.spark.sql.DataFrame, w: Int, parts: Int): Set[(Long, Long, Int)] =
    SortedNeighborhood.pairs(df, Seq("name", "key"), w, parts)
      .select(col("a_key"), col("b_key"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet

  test("matches the global-window oracle across partition counts (sf0.001 part)") {
    val df = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
    val oracle = naivePairs(df, 2)
    for (parts <- Seq(1, 3, 8)) {
      assert(opPairs(df, 2, parts) === oracle, s"parts=$parts")
    }
  }

  test("boundary overlap spans runt partitions (parts >> rows, w > partition size)") {
    // 6 rows over 8 range partitions: most hold 0–1 rows, so a w=3
    // successor regularly lives 2+ partitions ahead — the exact case the
    // concatenated-heads overlap exists for
    val df = (1L to 6L).map(i => (i, f"name$i%02d")).toDF("key", "name")
    val oracle = naivePairs(df, 3)
    assert(oracle.size === 5 + 4 + 3) // w=3 over 6 rows
    assert(opPairs(df, 3, 8) === oracle)
  }

  test("anchors never come from overlap rows (no duplicate pairs)") {
    val df = (1L to 200L).map(i => (i, f"n$i%03d")).toDF("key", "name")
    val got = SortedNeighborhood.pairs(df, Seq("name", "key"), 2, 7)
      .select("a_key", "b_key", "dist").collect()
    assert(got.length === got.distinct.length)
    assert(got.length === 199 + 198)
  }

  test("randomized trials: heavy tie rates, any w/parts, always equals the naive window") {
    // fixed-seed trials (PropertiesSpec discipline — failures replay):
    // names drawn from a TINY vocabulary so long runs of identical sort
    // keys straddle range-partition boundaries, the riskiest path for the
    // overlap logic (the tiebreaker key keeps the total order strict)
    val rng = new scala.util.Random(42)
    val vocab = Vector("aa", "ab", "ba", "bb", "ca")
    for (trial <- 1 to 15) {
      val n = 5 + rng.nextInt(60)
      val rows = (0 until n).map(i => ((i + 1).toLong, vocab(rng.nextInt(vocab.size))))
      val df = rows.toDF("key", "name")
      val w = 1 + rng.nextInt(4)
      val parts = 1 + rng.nextInt(10)
      // independent oracle: in-memory global sort + sliding pairs
      val sorted = rows.sortBy { case (k, nm) => (nm, k) }
      val expected = (for {
        i <- sorted.indices; d <- 1 to w if i + d < sorted.length
      } yield (sorted(i)._1, sorted(i + d)._1, d)).toSet
      assert(opPairs(df, w, parts) === expected,
        s"trial $trial: n=$n w=$w parts=$parts")
    }
  }

  test("parallelism is the requested partition count, not a key-prefix ceiling") {
    val df = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
    val sorted = df.repartitionByRange(8, col("name"), col("key"))
    assert(sorted.rdd.getNumPartitions === 8)
  }
}
