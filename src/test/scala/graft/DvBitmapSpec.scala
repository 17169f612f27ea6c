package graft

import scala.util.Random

import graft.sources.DvBitmap

/** The deletion-vector bitmap kernel: chunked u16-array/bitset containers
  * behind one serialized blob. Properties: build→parse→contains is the
  * membership function of the input set (unsorted, duplicated input
  * tolerated), the sparse→dense container flip at 4096 marks is
  * invisible to probes, and the dense form caps a chunk's cost at 8 KiB
  * no matter how many of its 65536 rows die — the bound that makes the
  * scan-side broadcast O(compressed bytes) instead of O(deleted rows).
  */
class DvBitmapSpec extends SparkSpec {

  private def roundTrip(positions: Seq[Long]): DvBitmap.Bitmap =
    DvBitmap.parse(DvBitmap.build(positions.toArray))

  test("membership round-trip across chunk boundaries, unsorted + duplicated input") {
    val rnd = new Random(7)
    val positions = Seq.fill(5000)(rnd.nextLong(1L << 40)) ++
      Seq(0L, 65535L, 65536L, (1L << 40) - 1) ++
      Seq(42L, 42L, 42L) // duplicates must collapse
    val shuffled = rnd.shuffle(positions)
    val bm = roundTrip(shuffled)
    val set = positions.toSet
    for (p <- set) assert(bm.contains(p), s"lost $p")
    assert(bm.cardinality === set.size)
    // probes around every member: the neighbor is in iff it was inserted
    for (p <- set.take(500); d <- Seq(-1L, 1L); q = p + d if q >= 0)
      assert(bm.contains(q) === set(q), s"wrong answer at $q")
  }

  test("sparse→dense flip at 4096 marks per chunk is invisible to probes") {
    for (n <- Seq(4095, 4096, 4097)) {
      val positions = (0 until n).map(i => (i * 16L) % 65536).distinct
      val bm = roundTrip(positions.map(_ + (7L << 16))) // all in one chunk
      val set = positions.toSet
      for (low <- 0L until 65536L by 257L)
        assert(bm.contains((7L << 16) + low) === set(low),
          s"n=$n mismatch at $low")
    }
  }

  test("dense chunk cost is capped: 60000 marks serialize under 8.3 KiB") {
    val positions = (0 until 60000).map(_.toLong).toArray
    val bytes = DvBitmap.build(positions)
    assert(bytes.length <= 4 + 13 + 8192,
      s"dense chunk not capped: ${bytes.length} bytes")
    val bm = DvBitmap.parse(bytes)
    assert(bm.cardinality === 60000)
    assert(bm.contains(59999L) && !bm.contains(60000L))
  }

  test("sparse chunks cost ~2 bytes per mark") {
    val positions = Array(1L, 100L, 65540L, (1L << 33) + 5)
    val bytes = DvBitmap.build(positions)
    // 4 header + 3 chunks × 13 + 4 entries × 2
    assert(bytes.length === 4 + 3 * 13 + 4 * 2)
    val bm = DvBitmap.parse(bytes)
    assert(positions.forall(bm.contains))
    assert(!bm.contains(2L) && !bm.contains(65541L))
  }

  test("empty and negative inputs are rejected loudly") {
    intercept[IllegalArgumentException](DvBitmap.build(Array.empty[Long]))
    intercept[IllegalArgumentException](DvBitmap.build(Array(-1L)))
  }

  test("pruned reads ship only the pruned partitions' bitmaps; over-budget falls back") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    import graft.sources.{AtomicCommit, Deletes, DvKeep}
    val root = java.nio.file.Files.createTempDirectory("graft_dvb_prune").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 300L).map(i => (i, Seq("A", "B", "C")((i % 3).toInt)))
        .toDF("k", "p"), "p")
    // one MoR delete marking rows in EVERY partition → each carries a bitmap
    Deletes.deleteWhereMoR(spark, root, col("k") % 10 === 0)
    def shipped(df: org.apache.spark.sql.DataFrame): Set[String] =
      df.queryExecution.analyzed.collect {
        case n => n.expressions.flatMap(_.collect { case kp: DvKeep => kp })
      }.flatten.flatMap(_.bitmaps.keys.map(_._1.toString)).toSet
    // a partition-pruned read ships bitmaps for the pruned partition ONLY
    // — the plan-reference map is O(scanned partitions' evidence), not
    // O(table's outstanding deletes)
    val dfA = AtomicCommit.readPartitions(spark, root, Seq("A")).get
    assert(shipped(dfA) === Set("A"))
    assert(dfA.count() === 90L) // A holds k≡0 (mod 3); k≡0 (mod 30) died
    // the whole-table read ships all three
    assert(shipped(AtomicCommit.read(spark, root)) === Set("A", "B", "C"))
    // a tiny budget forces the anti-join fallback: no bitmaps ride the
    // plan, the answers do not change
    withSQLConf(DvBitmap.BudgetConf -> "1") {
      val df2 = AtomicCommit.read(spark, root)
      assert(shipped(df2).isEmpty, "over budget must not ship bitmaps")
      assert(df2.count() === 270L)
    }
  }
}
