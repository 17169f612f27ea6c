package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes}

/** Copy-on-write row deletes over the manifest table: one atomic commit
  * rewrites exactly the partitions holding matches and DROPS the ones the
  * delete empties; stats-pruned range deletes never rewrite (or scan)
  * provably-disjoint partitions — observable as unchanged generation
  * owners; SQL DELETE null semantics; the pre-delete snapshot stays
  * time-travelable.
  */
class DeletesSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_del").toString

  private def snap(root: String): Set[(Long, String, Long)] =
    AtomicCommit.read(spark, root)
      .select("k", "flag", "v").as[(Long, String, Long)].collect().toSet

  test("deleteWhere rewrites matching partitions, drops emptied ones, in one version") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L), (4L, "C", 40L))
        .toDF("k", "flag", "v"), "flag")
    // deletes one of A's rows and ALL of B's — B must vanish from the
    // manifest, and both effects land in a single commit
    val v = Deletes.deleteWhere(spark, root, $"v" === 20L || $"flag" === "B")
    assert(v === Some(2L))
    assert(snap(root) === Set((1L, "A", 10L), (4L, "C", 40L)))
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.keySet === Set("A", "C"))
    // time travel: the pre-delete snapshot is intact at v1
    assert(AtomicCommit.readAt(spark, root, 1L).count() === 4L)
  }

  test("no matches is a no-op: None returned, no version burned") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L)).toDF("k", "flag", "v"), "flag")
    assert(Deletes.deleteWhere(spark, root, $"v" > 99L) === None)
    assert(AtomicCommit.currentVersion(root) === Some(1L))
  }

  test("SQL DELETE null semantics: an UNKNOWN predicate keeps the row") {
    val root = freshRoot()
    Seq[(Long, String, Option[Long])]((1L, "A", Some(10L)), (2L, "A", None))
      .toDF("k", "flag", "v")
      .transform(df => {
        AtomicCommit.commitReplacePartitions(spark, root, df, "flag"); df
      })
    Deletes.deleteWhere(spark, root, $"v" < 100L) // null < 100 is UNKNOWN
    val left = AtomicCommit.read(spark, root)
      .select("k").as[Long].collect().toSet
    assert(left === Set(2L), "the null-v row must survive, the true-row must not")
  }

  test("deleteRange: stats-disjoint partitions keep their generation (never rewritten)") {
    val root = freshRoot()
    val df = (
      (1L to 10L).map(i => (i, "A", i)) ++
      (100L to 110L).map(i => (i, "B", i)) ++
      (1000L to 1010L).map(i => (i, "C", i))).toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v"))
    val ownersBefore = AtomicCommit.readManifest(root).get.entries
    val v = Deletes.deleteRange(spark, root, "v", 100L, 105L, Seq("v"))
    assert(v === Some(2L))
    assert(snap(root).map(_._1) ===
      ((1L to 10L) ++ (106L to 110L) ++ (1000L to 1010L)).toSet)
    val ownersAfter = AtomicCommit.readManifest(root).get.entries
    assert(ownersAfter("A") === ownersBefore("A"), "A was provably disjoint")
    assert(ownersAfter("C") === ownersBefore("C"), "C was provably disjoint")
    assert(ownersAfter("B") !== ownersBefore("B"), "B must be rewritten")
    // statsCols refreshed B's evidence: the deleted range now prunes ALL
    val none = DataSkipping.readWhere(spark, root, "v", 100L, 105L)
    assert(none.count() === 0L)
    assert(none.inputFiles.isEmpty,
      "post-delete stats must prove the deleted range empty without a scan")
  }

  test("deleteRange with fully-disjoint stats is a no-op without scanning") {
    val root = freshRoot()
    DataSkipping.commitWithStats(spark, root,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    assert(Deletes.deleteRange(spark, root, "v", 5000L, 6000L) === None)
    assert(AtomicCommit.currentVersion(root) === Some(1L))
  }

  test("emptying the whole table is rejected: the last partition cannot drop") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L)).toDF("k", "flag", "v"), "flag")
    val e = intercept[IllegalArgumentException] {
      Deletes.deleteWhere(spark, root, lit(true))
    }
    assert(e.getMessage.contains("zero partitions"))
    assert(snap(root) === Set((1L, "A", 10L)), "the failed delete changed nothing")
  }
}
