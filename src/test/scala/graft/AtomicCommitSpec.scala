package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import graft.sources.AtomicCommit

/** The property that distinguishes the manifest commit from dynamic
  * partition overwrite: a reader NEVER observes a half-published
  * multi-partition refresh — either the whole old snapshot or the whole
  * new one.
  */
class AtomicCommitSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String = {
    val d = Files.createTempDirectory("graft_ac").toString
    d
  }

  private def snap(root: String): Map[(String, Long), Double] =
    AtomicCommit.read(spark, root)
      .select("k", "flag", "v").as[(Long, String, Double)].collect()
      .map { case (k, f, v) => (f, k) -> v }.toMap

  test("commit + read round-trips a partitioned snapshot") {
    val root = freshRoot()
    val df = Seq((1L, "A", 1.0), (2L, "A", 2.0), (3L, "B", 3.0))
      .toDF("k", "flag", "v")
    val v1 = AtomicCommit.commitReplacePartitions(spark, root, df, "flag")
    assert(v1 === 1L)
    assert(snap(root) === Map(("A", 1L) -> 1.0, ("A", 2L) -> 2.0, ("B", 3L) -> 3.0))
  }

  test("replace-partitions: only partitions present in the commit change owner") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 1.0), (3L, "B", 3.0)).toDF("k", "flag", "v"), "flag")
    val v2 = AtomicCommit.commitReplacePartitions(spark, root,
      Seq((9L, "B", 9.0)).toDF("k", "flag", "v"), "flag")
    assert(v2 === 2L)
    // A still owned by g1, B replaced wholesale by g2
    assert(snap(root) === Map(("A", 1L) -> 1.0, ("B", 9L) -> 9.0))
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries("A").startsWith("g00001"))
    assert(m.entries("B").startsWith("g00002"))
  }

  test("crash window: a staged-but-unpublished commit is invisible; publish flips atomically") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 1.0), (3L, "B", 3.0)).toDF("k", "flag", "v"), "flag")
    val before = snap(root)
    // phase 1 only — this is the crash point dynamic overwrite can't
    // survive: BOTH partitions already rewritten on disk, manifest not yet
    // flipped. The reader must see the complete OLD snapshot.
    val staged = AtomicCommit.stage(spark, root,
      Seq((7L, "A", 7.0), (8L, "B", 8.0)).toDF("k", "flag", "v"), "flag")
    assert(snap(root) === before, "staged generation leaked into a read")
    // phase 2 — now BOTH partitions flip in one rename
    AtomicCommit.publish(root, staged)
    assert(snap(root) === Map(("A", 7L) -> 7.0, ("B", 8L) -> 8.0))
  }

  test("vacuum drops only unreferenced generations; reads survive") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 1.0), (3L, "B", 3.0)).toDF("k", "flag", "v"), "flag")
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((7L, "A", 7.0), (8L, "B", 8.0)).toDF("k", "flag", "v"), "flag")
    val dropped = AtomicCommit.vacuum(root)
    assert(dropped.size === 1 && dropped.head.startsWith("g00001"))
    assert(snap(root) === Map(("A", 7L) -> 7.0, ("B", 8L) -> 8.0))
    // idempotent
    assert(AtomicCommit.vacuum(root) === Nil)
  }

  test("mismatched partition column is rejected before any data is written") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 1.0)).toDF("k", "flag", "v"), "flag")
    val e = intercept[IllegalArgumentException] {
      AtomicCommit.stage(spark, root,
        Seq((1L, "A", 1.0)).toDF("k", "flag", "v"), "k")
    }
    assert(e.getMessage.contains("partitioned by"))
  }
}
