package graft

import graft.ops.BloomJoin
import org.apache.spark.sql.functions._

/** Pins [[graft.ops.BloomJoin]]'s contract: membership is a SUPERSET of
  * the true key set (no false negatives — the property that makes an
  * exact join downstream semantics-preserving), the false-positive rate
  * is in the expected regime, and degenerate inputs behave.
  */
class BloomJoinSpec extends SparkSpec {
  import spark.implicits._

  test("no false negatives: every inserted key passes its own filter") {
    val keys = spark.range(0, 5000).select((col("id") * 7 + 3).as("k"))
    val bloom = BloomJoin.build(keys, "k")
    val back = BloomJoin.prune(keys.select(col("k")), "k", bloom)
    assert(back.count() === 5000L)
  }

  test("bloom-pruned exact join equals the unpruned exact join") {
    val build = spark.range(0, 1000).select((col("id") * 3).as("k"))
    val probe = spark.range(0, 9000).select(col("id").as("k"),
      (col("id") % 100).as("v"))
    val bloom = BloomJoin.build(build, "k")
    val pruned = BloomJoin.prune(probe, "k", bloom)
      .join(build, "k").groupBy("v").count()
    val exact = probe.join(build, "k").groupBy("v").count()
    assert(pruned.exceptAll(exact).isEmpty && exact.exceptAll(pruned).isEmpty)
  }

  test("false-positive rate stays in the designed regime") {
    // 2,000 build keys in m=2^16, k=3 → fpp ≈ (1−e^{−3·2000/65536})^3 ≈ 0.06%.
    // Probe 20,000 disjoint keys; allow a generous 10× margin over design.
    val build = spark.range(0, 2000).select(col("id").as("k"))
    val probe = spark.range(1000000, 1020000).select(col("id").as("k"))
    val bloom = BloomJoin.build(build, "k")
    val fp = BloomJoin.prune(probe, "k", bloom).count()
    assert(fp <= 120, s"false positives: $fp of 20000")
  }

  test("empty build side rejects every probe row (correct semi-join result)") {
    val bloom = BloomJoin.build(
      spark.range(0).select(col("id").as("k")), "k")
    assert(bloom.count() === 1L) // one row, empty map — still broadcastable
    val kept = BloomJoin.prune(
      spark.range(0, 100).select(col("id").as("k")), "k", bloom).count()
    assert(kept === 0L)
  }

  test("different salts draw independent filters (mismatched probe misses)") {
    val keys = Seq(42L).toDF("k")
    val bloom = BloomJoin.build(keys, "k", salt = 1L)
    // probing with the matching salt hits; the default salt must not be
    // guaranteed to hit — we only pin the POSITIVE contract here
    assert(BloomJoin.prune(keys, "k", bloom, salt = 1L).count() === 1L)
  }
}
