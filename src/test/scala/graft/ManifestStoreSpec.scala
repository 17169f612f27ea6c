package graft

import java.nio.file.{Files, Paths}

import graft.sources.{AtomicCommit, InMemoryObjectStore, ManifestStore, PosixManifestStore}

/** The storage-portability claim of [[graft.sources.AtomicCommit]]: the
  * commit protocol's only atomic primitive is
  * [[ManifestStore.putIfAbsent]], so the WHOLE protocol — racing writers,
  * read-set conflicts, time travel, vacuum — must run unchanged against a
  * store that offers nothing but an object-store conditional put (no
  * rename, no hard links, flat keys, whole-object visibility). The
  * [[InMemoryObjectStore]] models exactly that contract; every test here
  * re-runs an AtomicCommitSpec property through it, and the final test
  * proves no manifest ever touched the filesystem.
  */
class ManifestStoreSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ms").toString

  private def snap(root: String, store: ManifestStore): Map[(String, Long), Double] =
    AtomicCommit.read(spark, root, store)
      .select("k", "flag", "v").as[(Long, String, Double)].collect()
      .map { case (k, f, v) => (f, k) -> v }.toMap

  private def commit(root: String, store: ManifestStore,
                     rows: Seq[(Long, String, Double)]): Long =
    AtomicCommit.commitReplacePartitions(spark, root, store,
      rows.toDF("k", "flag", "v"), "flag", 1)

  test("object store: commit + replace-partitions round-trip, no manifest on disk") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    assert(commit(root, store, Seq((1L, "A", 1.0), (3L, "B", 3.0))) === 1L)
    assert(commit(root, store, Seq((9L, "B", 9.0))) === 2L)
    assert(snap(root, store) === Map(("A", 1L) -> 1.0, ("B", 9L) -> 9.0))
    // the manifests live ONLY in the store: the data directory holds
    // generation dirs and nothing manifest-shaped — the protocol needed
    // no filesystem atomicity at all
    val onDisk = Paths.get(root).toFile.listFiles.map(_.getName)
    assert(!onDisk.exists(_.contains("manifest")), onDisk.mkString(", "))
    assert(store.list().count(_.startsWith("_graft_manifest.v")) === 2)
  }

  test("object store: staged generation is invisible until the conditional put") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    commit(root, store, Seq((1L, "A", 1.0), (3L, "B", 3.0)))
    val before = snap(root, store)
    val staged = AtomicCommit.stage(spark, root, store,
      Seq((7L, "A", 7.0), (8L, "B", 8.0)).toDF("k", "flag", "v"), "flag", 1)
    assert(snap(root, store) === before, "staged generation leaked into a read")
    AtomicCommit.publish(root, store, staged)
    assert(snap(root, store) === Map(("A", 7L) -> 7.0, ("B", 8L) -> 8.0))
  }

  test("object store: simultaneous publishes serialize through putIfAbsent, both land") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    commit(root, store, Seq((1L, "A", 1.0), (3L, "B", 3.0)))
    val sA = AtomicCommit.stage(spark, root, store,
      Seq((7L, "A", 7.0)).toDF("k", "flag", "v"), "flag", 1)
    val sB = AtomicCommit.stage(spark, root, store,
      Seq((9L, "B", 9.0)).toDF("k", "flag", "v"), "flag", 1)
    val gate = new java.util.concurrent.CountDownLatch(1)
    val pool = java.util.concurrent.Executors.newFixedThreadPool(2)
    try {
      val fA = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { gate.await(); AtomicCommit.publish(root, store, sA) }
      })
      val fB = pool.submit(new java.util.concurrent.Callable[Long] {
        def call(): Long = { gate.await(); AtomicCommit.publish(root, store, sB) }
      })
      gate.countDown()
      val got = Set(fA.get(60, java.util.concurrent.TimeUnit.SECONDS),
        fB.get(60, java.util.concurrent.TimeUnit.SECONDS))
      assert(got === Set(2L, 3L), s"expected versions 2 and 3, got $got")
    } finally pool.shutdown()
    assert(snap(root, store) === Map(("A", 7L) -> 7.0, ("B", 9L) -> 9.0))
  }

  test("object store: same-partition writers — read-set check aborts exactly one") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    commit(root, store, Seq((1L, "A", 1.0), (3L, "B", 3.0)))
    val sA = AtomicCommit.stage(spark, root, store,
      Seq((7L, "A", 7.0)).toDF("k", "flag", "v"), "flag", 1)
    val sB = AtomicCommit.stage(spark, root, store,
      Seq((9L, "A", 9.0)).toDF("k", "flag", "v"), "flag", 1)
    assert(AtomicCommit.publish(root, store, sA) === 2L)
    intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.publish(root, store, sB)
    }
    assert(snap(root, store) === Map(("A", 7L) -> 7.0, ("B", 3L) -> 3.0))
  }

  test("object store: time travel, manifest-pruned CDC, and vacuum horizon") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    commit(root, store, Seq((1L, "A", 1.0), (3L, "B", 3.0)))
    commit(root, store, Seq((7L, "A", 7.0)))
    assert(AtomicCommit.versions(store) === Seq(1L, 2L))
    def at(v: Long) = AtomicCommit.readAt(spark, root, store, v)
      .select("k", "flag", "v").as[(Long, String, Double)].collect()
      .map { case (k, f, x) => (f, k) -> x }.toMap
    assert(at(1L) === Map(("A", 1L) -> 1.0, ("B", 3L) -> 3.0))
    assert(at(2L) === Map(("A", 7L) -> 7.0, ("B", 3L) -> 3.0))
    assert(AtomicCommit.changedPartitions(store, root, 1L, 2L) === Seq("A"))
    val d = AtomicCommit.diff(spark, root, store, 1L, 2L, "k")
      .select("change_type", "k").as[(String, Long)].collect().toSet
    assert(d === Set(("delete", 1L), ("insert", 7L)))
    // vacuum prunes superseded generations from DISK and old manifests
    // from the STORE — the two halves of the table live apart. Here gen1
    // still owns partition B under the current manifest, so no directory
    // is droppable yet; only the manifest history shrinks.
    val dropped = AtomicCommit.vacuum(root, store, AtomicCommit.OrphanRetentionMillis)
    assert(dropped.isEmpty)
    assert(AtomicCommit.versions(store) === Seq(2L))
    assert(snap(root, store) === Map(("A", 7L) -> 7.0, ("B", 3L) -> 3.0))
    intercept[RuntimeException] { at(1L) }
  }

  test("putIfAbsent contract: both stores refuse an occupied name and never tear a body") {
    val posixRoot = Files.createTempDirectory("graft_ps").toString
    val stores = Seq(
      "posix" -> new PosixManifestStore(posixRoot),
      "memory" -> new InMemoryObjectStore)
    for ((label, store) <- stores) {
      assert(store.putIfAbsent("m1", "first".getBytes("UTF-8")), label)
      assert(!store.putIfAbsent("m1", "second".getBytes("UTF-8")), label)
      // the loser's body never replaces or mixes into the winner's
      assert(new String(store.get("m1").get, "UTF-8") === "first", label)
      assert(store.get("absent").isEmpty, label)
      store.delete("m1")
      assert(store.get("m1").isEmpty, label)
      store.delete("m1") // idempotent
    }
  }

  test("posix store: a crashed writer's temp file ages out via vacuumTemps") {
    val root = Files.createTempDirectory("graft_pt").toString
    val store = new PosixManifestStore(root)
    store.putIfAbsent("_graft_manifest.v00000001.json", "{}".getBytes("UTF-8"))
    // strand a temp file the way a crash between write and link would
    val tmp = Paths.get(root, "_graft_manifest.tmp_deadbeef")
    Files.write(tmp, "torn".getBytes("UTF-8"))
    Thread.sleep(10)
    store.vacuumTemps(System.currentTimeMillis() + 1)
    assert(!Files.exists(tmp), "stranded temp file must be removed")
    assert(store.get("_graft_manifest.v00000001.json").isDefined,
      "published manifests are not temps")
  }
}
