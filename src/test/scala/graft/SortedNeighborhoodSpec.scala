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

  test("multiPass equals the canonicalized union of its single passes, dist = min across passes") {
    // two orderings over 80 rows with DIFFERENT leading fields: the pair
    // sets overlap heavily but not fully, and orientation can flip between
    // passes (x before y under one ordering, after it under the other)
    val rng = new scala.util.Random(7)
    val vocab = Vector("aa", "ab", "ba", "bb")
    val rows = (1L to 80L).map(i =>
      (i, vocab(rng.nextInt(vocab.size)), vocab(rng.nextInt(vocab.size))))
    val df = rows.toDF("key", "name", "zip")
    val w = 2; val parts = 5
    val orderings = Seq(Seq("name", "zip"), Seq("zip", "name"))

    // independent oracle: per-ordering in-memory sliding pairs, then the
    // same canonicalize-and-min-dist fold, in plain Scala collections
    def passPairs(by: ((Long, String, String)) => (String, String, Long)) = {
      val sorted = rows.sortBy(by)
      for { i <- sorted.indices; d <- 1 to w if i + d < sorted.length }
        yield (sorted(i)._1, sorted(i + d)._1, d)
    }
    val expected = (passPairs(r => (r._2, r._3, r._1)) ++ passPairs(r => (r._3, r._2, r._1)))
      .map { case (a, b, d) => if (a <= b) (a, b, d) else (b, a, d) }
      .groupBy { case (a, b, _) => (a, b) }
      .map { case ((a, b), ps) => (a, b, ps.map(_._3).min) }.toSet

    val got = SortedNeighborhood.multiPass(df, "key", orderings, w, parts)
      .select(col("a_key"), col("b_key"), col("dist"))
      .as[(Long, Long, Int)].collect()
    assert(got.length === got.distinct.length, "dedup must leave no duplicate pairs")
    assert(got.map { case (a, b, d) => (a, b, d.toLong) }.toSet === expected)
    // the union is genuinely multi-pass: strictly more pairs than either
    // single pass alone, strictly fewer than their non-deduped sum
    val single = passPairs(r => (r._2, r._3, r._1)).size
    assert(got.length > single && got.length < 2 * single)
  }

  test("multiPass with one ordering reduces to pairs() with canonical orientation") {
    val df = (1L to 30L).map(i => (i, f"n${(i * 7) % 30}%02d")).toDF("key", "name")
    val one = SortedNeighborhood.multiPass(df, "key", Seq(Seq("name")), 2, 3)
      .select(col("a_key"), col("b_key"), col("dist"))
      .as[(Long, Long, Int)].collect().toSet
    val base = SortedNeighborhood.pairs(df, Seq("name", "key"), 2, 3)
      .select(col("a_key"), col("b_key"), col("dist"))
      .as[(Long, Long, Int)].collect()
      .map { case (a, b, d) => if (a <= b) (a, b, d) else (b, a, d) }.toSet
    assert(one === base)
  }

  test("parallelism is the requested partition count, not a key-prefix ceiling") {
    val df = Tables.part(spark, sf0001)
      .select(col("p_partkey").as("key"), col("p_name").as("name"))
    val sorted = df.repartitionByRange(8, col("name"), col("key"))
    assert(sorted.rdd.getNumPartitions === 8)
  }
}
