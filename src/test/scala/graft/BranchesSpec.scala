package graft

import java.nio.file.Files

import org.apache.spark.sql.functions.col

import graft.sources.{AtomicCommit, BranchStore, DataSkipping, Deletes, InMemoryObjectStore}

/** Branches ([[graft.sources.BranchStore]] + the [[graft.sources
  * .AtomicCommit]] lifecycle): a branch is the table seen through a
  * name-translating store view, so every commit/read API runs against it
  * unchanged. Pinned here: fork isolation in both directions, the whole
  * API surface working on a branch view (append, delete, time travel,
  * skipping), fast-forward merge with divergence abort, branch-aware
  * vacuum (shared generations survive while ANY lineage reads them;
  * dropped branches release theirs), and the plain-vacuum safety net.
  */
class BranchesSpec extends SparkSpec {
  import spark.implicits._

  private def rows(root: String, store: graft.sources.ManifestStore): Set[(String, Long, String)] =
    AtomicCommit.read(spark, root, store)
      .select("p", "k", "v").as[(String, Long, String)].collect().toSet

  test("fork, diverge, read isolation, fast-forward merge") {
    val root = Files.createTempDirectory("graft_br").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    val fork = AtomicCommit.createBranch(root, store, "dev")
    assert(fork === 1L)
    assert(AtomicCommit.branches(store) === Seq("dev"))
    val dev = AtomicCommit.branchStore(store, "dev")

    // the branch sees the fork snapshot; commits to it are invisible on
    // main, and vice versa would abort the merge (tested below)
    assert(rows(root, dev) === rows(root, store))
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("a", 3L, "dev-only")).toDF("p", "k", "v"), "p", 1)
    Deletes.deleteWhere(spark, root, dev, col("k") === 2L, Nil)
    assert(rows(root, store).map(_._2) === Set(1L, 2L), "main untouched")
    assert(rows(root, dev).map(_._2) === Set(1L, 3L))
    // time travel within the branch reaches its own history
    assert(AtomicCommit.readAt(spark, root, dev, fork)
      .count() === 2L)
    // a new partition born on the branch
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("c", 10L, "r10")).toDF("p", "k", "v"), "p", 1)

    // fast-forward: main still at the fork version → merge lands
    val merged = AtomicCommit.mergeBranch(root, store, "dev")
    assert(merged === 2L)
    assert(rows(root, store).map(_._2) === Set(1L, 3L, 10L))
    // the fork marker does not leak into main
    assert(!AtomicCommit.readManifest(store).get.props.contains("graft.branch.base"))
  }

  test("merge aborts when main diverged; re-fork is the loser protocol") {
    val root = Files.createTempDirectory("graft_br2").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.createBranch(root, store, "feat")
    val feat = AtomicCommit.branchStore(store, "feat")
    AtomicCommit.commitAppendPartitions(spark, root, feat,
      Seq(("a", 2L, "branch")).toDF("p", "k", "v"), "p", 1)
    // main moves concurrently
    AtomicCommit.commitAppendPartitions(spark, root, store,
      Seq(("a", 3L, "main")).toDF("p", "k", "v"), "p", 1)
    intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "feat")
    }
    assert(rows(root, store).map(_._2) === Set(1L, 3L), "failed merge changes nothing")
    // duplicate fork names are refused; drop releases the name
    intercept[IllegalArgumentException] {
      AtomicCommit.createBranch(root, store, "feat")
    }
    AtomicCommit.dropBranch(store, "feat")
    assert(AtomicCommit.branches(store) === Nil)
    assert(AtomicCommit.createBranch(root, store, "feat") === 2L)
  }

  test("branch-aware vacuum: shared generations survive any lineage, dropped branches release") {
    val root = Files.createTempDirectory("graft_br3").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "shared")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.createBranch(root, store, "dev")
    val dev = AtomicCommit.branchStore(store, "dev")
    // main REPLACES partition a (supersedes the shared generation on
    // main's lineage) — but dev still reads the fork snapshot
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 2L, "main-v2")).toDF("p", "k", "v"), "p", 1)
    // plain vacuum on a store WITH branches must behave branched: the
    // shared generation is main-dead but dev-live, so it survives
    AtomicCommit.vacuum(root, store, 0L, 1)
    assert(rows(root, dev).map(_._2) === Set(1L),
      "dev's fork snapshot must survive main's vacuum")
    assert(rows(root, store).map(_._2) === Set(2L))
    // drop the branch: the next sweep reclaims the now-unreferenced gen
    AtomicCommit.dropBranch(store, "dev")
    val reclaimed = AtomicCommit.vacuumBranched(root, store, 0L, 1)
    assert(reclaimed.nonEmpty, "dropping the last holder must free the generation")
    assert(rows(root, store).map(_._2) === Set(2L))
  }

  test("branch views compose with stats sidecars and the changed-partition walk") {
    val root = Files.createTempDirectory("graft_br4").toString
    val store = new InMemoryObjectStore
    DataSkipping.commitWithStats(spark, root, store,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    AtomicCommit.createBranch(root, store, "x")
    val bx = AtomicCommit.branchStore(store, "x")
    DataSkipping.commitWithStats(spark, root, bx,
      (100L to 110L).map(i => (i, "B", i)).toDF("k", "flag", "v"),
      "flag", Seq("v"))
    // skipping prunes through the branch view (B intersects, A does not)
    val got = DataSkipping.readWhere(spark, root, bx, "v", 100L, 120L)
    assert(got.count() === 11L)
    assert(got.inputFiles.forall(_.contains("flag=B")))
    // main never learned about B
    assert(AtomicCommit.readManifest(store).get.entries.keySet === Set("A"))
    assert(AtomicCommit.changedPartitions(bx, root, 1L, 2L) === Seq("B"))
  }

  test("merge translates branch tags: shared kept, head re-pinned, intermediates dropped") {
    val root = Files.createTempDirectory("graft_br_tags").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.tag(root, store, "prefork", 1L) // main v2 (props-only)
    val fork = AtomicCommit.createBranch(root, store, "dev")
    assert(fork === 2L)
    val dev = AtomicCommit.branchStore(store, "dev")
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("c", 3L, "r3")).toDF("p", "k", "v"), "p", 1) // bv3
    AtomicCommit.tag(root, dev, "mid", 3L) // bv4 — branch-only snapshot
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("d", 4L, "r4")).toDF("p", "k", "v"), "p", 1) // bv5
    AtomicCommit.tag(root, dev, "head", 5L) // bv6 — entries equal the head's

    val merged = AtomicCommit.mergeBranch(root, store, "dev")
    assert(merged === 3L)
    val tags = AtomicCommit.tags(store)
    // shared history: carried verbatim; head: re-pinned to the version
    // the merge published; branch-only intermediate: dropped, never a
    // dangling pin into main's future
    assert(tags === Map("prefork" -> 1L, "head" -> merged))
    assert(AtomicCommit.readTag(spark, root, store, "head")
      .count() === 4L)
    assert(AtomicCommit.readTag(spark, root, store, "prefork")
      .count() === 2L)
    // main commits again: the carried tags still pin the RIGHT snapshots
    AtomicCommit.commitAppendPartitions(spark, root, store,
      Seq(("e", 5L, "r5")).toDF("p", "k", "v"), "p", 1)
    assert(AtomicCommit.readTag(spark, root, store, "head").count() === 4L)
  }

  test("three-way merge: disjoint-partition lineages combine after main moves") {
    val root = Files.createTempDirectory("graft_br3w").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2"), ("c", 3L, "r3"))
        .toDF("p", "k", "v"), "p", 1)
    AtomicCommit.createBranch(root, store, "dev")
    val dev = AtomicCommit.branchStore(store, "dev")
    // branch: append into a, create d, delete-empty c  →  changes {a, c, d}
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("a", 10L, "dev-a"), ("d", 40L, "dev-d")).toDF("p", "k", "v"), "p", 1)
    Deletes.deleteWhere(spark, root, dev, col("p") === "c", Nil)
    // main moves too: replace b  →  changes {b} — disjoint from the branch
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("b", 20L, "main-b")).toDF("p", "k", "v"), "p", 1)

    val merged = AtomicCommit.mergeBranch(root, store, "dev")
    assert(merged === 3L)
    // both lineages' effects present: main's b replace, branch's a append,
    // branch's new d, branch's c drop
    assert(rows(root, store) === Set(
      ("a", 1L, "r1"), ("a", 10L, "dev-a"), ("b", 20L, "main-b"),
      ("d", 40L, "dev-d")))
    assert(AtomicCommit.readManifest(store).get.entries.keySet ===
      Set("a", "b", "d"))
    // pre-merge main history still replays
    assert(AtomicCommit.readAt(spark, root, store, 2L)
      .filter(col("p") === "b").count() === 1L)
  }

  test("three-way merge aborts on overlapping partitions, naming both write sets") {
    val root = Files.createTempDirectory("graft_br3w2").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.createBranch(root, store, "dev")
    val dev = AtomicCommit.branchStore(store, "dev")
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq(("a", 10L, "dev")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 99L, "main")).toDF("p", "k", "v"), "p", 1)
    val ex = intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "dev")
    }
    assert(ex.getMessage.contains("a") && ex.getMessage.contains("BOTH"))
    // nothing moved: main keeps its own lineage (its replace of a dropped
    // k=1), the branch keeps its own (its append preserved it)
    assert(rows(root, store).map(_._2) === Set(2L, 99L))
    assert(rows(root, dev).map(_._2) === Set(1L, 2L, 10L))
  }

  test("three-way merge: constraint changes on one side abort while the other wrote data") {
    val root = Files.createTempDirectory("graft_br3w3").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    AtomicCommit.createBranch(root, store, "dev")
    val dev = AtomicCommit.branchStore(store, "dev")
    AtomicCommit.addConstraint(spark, root, dev, "k_pos", "k > 0")
    // main commits data the branch's new constraint never validated
    AtomicCommit.commitAppendPartitions(spark, root, store,
      Seq(("b", 30L, "main")).toDF("p", "k", "v"), "p", 1)
    intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "dev")
    }
    // but with an entries-clean branch and data-clean main, a pure
    // constraint branch merges once main is quiet... (re-fork protocol)
    AtomicCommit.dropBranch(store, "dev")
    AtomicCommit.createBranch(root, store, "dev2")
    val dev2 = AtomicCommit.branchStore(store, "dev2")
    AtomicCommit.addConstraint(spark, root, dev2, "k_pos", "k > 0")
    val merged = AtomicCommit.mergeBranch(root, store, "dev2")
    assert(AtomicCommit.constraints(store) === Map("k_pos" -> "k > 0"))
    assert(merged === 3L)
  }
}
