package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes}

/** Row deletes over the manifest table, both strategies. Copy-on-write:
  * one atomic commit rewrites exactly the partitions holding matches and
  * DROPS the ones the delete empties; stats-pruned range deletes never
  * rewrite (or scan) provably-disjoint partitions — observable as
  * unchanged generation owners; SQL DELETE null semantics; the pre-delete
  * snapshot stays time-travelable. Merge-on-read (r14): a point delete
  * commits a deletion-vector generation and edits entries — data owners
  * byte-identical (nothing rewritten), vectors accumulate across deletes,
  * emptied partitions drop, appends commute with a live vector, every
  * rewrite (compaction included) purges it, skipping/count/CDC reads all
  * respect it, and the read set anchors like any read-modify-write.
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

  test("deleteWhereMoR: point delete commits a vector, rewrites nothing, history intact") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L), (4L, "C", 40L))
        .toDF("k", "flag", "v"), "flag")
    val before = AtomicCommit.readManifest(root).get.entries
    val v = Deletes.deleteWhereMoR(spark, root, $"k" === 2L)
    assert(v === Some(2L))
    assert(snap(root) === Set((1L, "A", 10L), (3L, "B", 30L), (4L, "C", 40L)))
    val m = AtomicCommit.readManifest(root).get
    // the data owners are byte-identical — NOTHING was rewritten; only a
    // deletion-vector token was added to the touched partition's entry
    assert(AtomicCommit.ownersOf(m.entries("A")) ===
      AtomicCommit.ownersOf(before("A")))
    assert(AtomicCommit.dvOf(m.entries("A")).nonEmpty)
    assert(AtomicCommit.dvOf(m.entries("B")).isEmpty, "untouched partitions carry no vector")
    // the commit classifies as a row delete in the log
    assert(AtomicCommit.history(root).last.kind === "rowdelete")
    // time travel: pre-delete snapshot intact
    assert(AtomicCommit.readAt(spark, root, 1L).count() === 4L)
  }

  test("MoR bitmap sidecar: join-free scan plan; removing it falls back to the anti-join, same rows") {
    val root = freshRoot()
    AtomicCommit.commitReplacePartitions(spark, root,
      (1L to 100L).map(k => (k, if (k % 2 == 0) "A" else "B", k * 10))
        .toDF("k", "flag", "v"), "flag")
    Deletes.deleteWhereMoR(spark, root, $"k" % 7 === 0)
    val expected = (1L to 100L).filter(_ % 7 != 0)
      .map(k => (k, if (k % 2 == 0) "A" else "B", k * 10)).toSet
    val df = AtomicCommit.read(spark, root)
    // the merge is the codegen'd bitmap probe INSIDE the scan — no
    // anti-join, no broadcast build anywhere in the vectored read
    val plan = df.queryExecution.executedPlan.toString
    assert(!plan.contains("LeftAnti"), s"vectored read still joins:\n$plan")
    assert(plan.contains("graft_dv_keep"), s"bitmap probe missing:\n$plan")
    assert(snap(root) === expected)
    // a vector written WITHOUT a sidecar (older writer) degrades to the
    // anti-join — identical rows, the join back in the plan
    val m = AtomicCommit.readManifest(root).get
    val dvGen = AtomicCommit.dvOf(m.entries("A")).get
    val dvb = java.nio.file.Paths.get(root, dvGen, "_dvb")
    import scala.jdk.CollectionConverters._
    java.nio.file.Files.walk(dvb).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.delete)
    val fallback = AtomicCommit.read(spark, root)
    assert(fallback.queryExecution.executedPlan.toString.contains("LeftAnti"))
    assert(fallback.select("k", "flag", "v")
      .as[(Long, String, Long)].collect().toSet === expected)
  }

  test("MoR vectors accumulate, empty partitions drop, appends commute, rewrites purge") {
    val root = freshRoot()
    DataSkipping.commitWithStats(spark, root,
      Seq((1L, "A", 10L), (2L, "A", 20L), (5L, "A", 50L), (3L, "B", 30L), (4L, "C", 40L))
        .toDF("k", "flag", "v"), "flag", Seq("v"))
    // two MoR deletes on the same partition: the second unions addresses
    assert(Deletes.deleteWhereMoR(spark, root, $"k" === 1L) === Some(2L))
    assert(Deletes.deleteWhereMoR(spark, root, $"k" === 2L) === Some(3L))
    assert(snap(root).map(_._1) === Set(5L, 3L, 4L))
    // a MoR delete that empties a partition drops it outright — no vector
    assert(Deletes.deleteWhereMoR(spark, root, $"flag" === "B") === Some(4L))
    assert(AtomicCommit.readManifest(root).get.entries.keySet === Set("A", "C"))
    // an append to a vectored partition commutes: new rows visible, old
    // deletes still effective, token carried forward
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((9L, "A", 90L)).toDF("k", "flag", "v"), "flag")
    assert(snap(root).map(_._1) === Set(5L, 9L, 4L))
    assert(AtomicCommit.dvOf(
      AtomicCommit.readManifest(root).get.entries("A")).nonEmpty)
    // skipping reads and metadata counts respect the vectors
    assert(DataSkipping.readWhere(spark, root, "v", 0L, 100L)
      .select("k").as[Long].collect().toSet === Set(5L, 9L, 4L))
    assert(DataSkipping.countWhere(spark, root, "v", 0L, 100L) === 3L)
    assert(DataSkipping.readWhereEq(spark, root, "k", 2L).count() === 0L)
    // CDC between versions sees the row-level deletes
    val d = AtomicCommit.diff(spark, root, 1L, 3L, "k")
    assert(d.filter($"change_type" === "delete").select("k").as[Long]
      .collect().toSet === Set(1L, 2L))
    // compaction scans the MERGED view and publishes plain entries: the
    // vectors purge, and vacuum reclaims their generations
    graft.sources.Compaction.compactAtomicTable(spark, root)
    val mc = AtomicCommit.readManifest(root).get
    assert(mc.entries.values.forall(e => AtomicCommit.dvOf(e).isEmpty))
    assert(snap(root).map(_._1) === Set(5L, 9L, 4L))
    AtomicCommit.vacuum(root, 0L, 1)
    assert(snap(root).map(_._1) === Set(5L, 9L, 4L))
    // after the rewrite the metadata count path is whole again (not
    // asserted via plans — via physical file removal in DataSkippingSpec)
  }

  test("MoR read-set: a concurrent commit to a touched partition aborts the delete") {
    val root = freshRoot()
    val inner = new graft.sources.InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, inner,
      Seq((1L, "A", 10L), (2L, "A", 20L)).toDF("k", "flag", "v"), "flag", 1)
    // the delete's manifest walk is list call 1; its publish validation
    // walk is call 2 — inject a concurrent replace of the touched
    // partition right before it (the ReadSetAnchorSpec window pattern)
    var fired = false
    val store = new graft.sources.ManifestStore {
      private var calls = 0
      def list(): Seq[String] = synchronized {
        calls += 1
        if (calls == 2 && !fired) {
          fired = true
          AtomicCommit.commitReplacePartitions(spark, root, inner,
            Seq((7L, "A", 70L)).toDF("k", "flag", "v"), "flag", 1)
        }
        inner.list()
      }
      def putIfAbsent(n: String, b: Array[Byte]) = inner.putIfAbsent(n, b)
      def get(n: String) = inner.get(n)
      def delete(n: String) = inner.delete(n)
    }
    intercept[AtomicCommit.PartitionConflictException] {
      Deletes.deleteWhereMoR(spark, root, store, $"k" === 1L)
    }
    assert(fired)
    // the concurrent replace won whole; the aborted delete marked nothing
    assert(AtomicCommit.read(spark, root, inner)
      .select("k").as[Long].collect().toSet === Set(7L))
  }


  test("deleteKeysMoR: equality semantics, re-inserts survive, evidence accumulates, purge") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    val staged = AtomicCommit.stage(spark, root, store,
      Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "A", 30L), (4L, "B", 40L))
        .toDF("k", "flag", "v"), "flag", 1)
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, store, staged)

    // a key provably absent everywhere: bloom-proven no-op, no version
    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(999999L)) === None)
    assert(AtomicCommit.currentVersion(root) === Some(1L))

    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(2L, 4L)) === Some(2L))
    assert(snap(root).map(_._1) === Set(1L, 3L), "B reads empty, A loses k=2")
    assert(AtomicCommit.history(root).last.kind === "rowdelete")
    // pre-delete snapshot intact
    assert(AtomicCommit.readAt(spark, root, 1L).count() === 4L)

    // OWNER SCOPING: re-inserting a deleted key via append SURVIVES —
    // the record binds the owner list at delete time, not the future
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((2L, "A", 21L)).toDF("k", "flag", "v"), "flag")
    assert(snap(root) === Set((1L, "A", 10L), (3L, "A", 30L), (2L, "A", 21L)))

    // a second equality delete and a position delete both CARRY the
    // existing evidence forward
    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(1L)).nonEmpty)
    assert(snap(root).map(_._1) === Set(3L, 2L))
    assert(Deletes.deleteWhereMoR(spark, root, $"k" === 3L).nonEmpty)
    assert(snap(root) === Set((2L, "A", 21L)),
      "position + two equality deletes all effective together")
    // skipping surfaces agree
    assert(DataSkipping.readWhereEq(spark, root, "k", 1L).count() === 0L)
    assert(DataSkipping.countWhere(spark, root, "v", 0L, 100L) === 1L)

    // compaction folds the merged view; equality evidence purges with it
    graft.sources.Compaction.compactAtomicTable(spark, root)
    assert(snap(root) === Set((2L, "A", 21L)))
    assert(AtomicCommit.dvOf(
      AtomicCommit.readManifest(root).get.entries("A")).isEmpty)
  }

  test("materializeEqDeletes: records resolve to position bitmaps, the batch face re-qualifies") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    // escaped + null partitions; Z holds one row and will fold out
    val df = Seq(
      (1L, Some("A"), 10L), (2L, Some("A"), 20L), (3L, Some("A"), 30L),
      (4L, Some("a/b"), 40L), (5L, Some("a/b"), 50L),
      (6L, Option.empty[String], 60L), (7L, Option.empty[String], 70L),
      (8L, Some("Z"), 80L)
    ).toDF("k", "flag", "v")
    val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, store, staged)
    // prior position delete — carried evidence the materializer re-homes
    assert(Deletes.deleteWhereMoR(spark, root, $"k" === 3L).nonEmpty)
    // equality takedown across all four partitions, then an owner-scoped
    // re-insert of one deleted key
    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(2L, 4L, 6L, 8L)).nonEmpty)
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((2L, "A", 21L)).toDF("k", "flag", "v"), "flag")
    val expect = Set((1L, "A", 10L), (2L, "A", 21L), (5L, "a/b", 50L),
      (7L, null, 70L))
    assert(snap(root) === expect)

    def face() = withSQLConf(
        graft.sources.GraftBatchScan.EnabledConf -> "true") {
      val rel = new graft.sources.GraftRelation(spark, root, store, None)
      graft.sources.GraftBatchScan.eligibleScan(rel, rel.schema, Array.empty)
    }
    // the RAW gate, auto-materialization pinned off (the self-heal
    // policy has its own spec in StoragePartitionedJoinSpec; this test
    // exercises the EXPLICIT materializer)
    withSQLConf(graft.sources.GraftBatchScan.AutoMaterializeConf -> "0") {
      assert(face().isEmpty,
        "outstanding equality records must gate the batch face out")
    }

    val v = Deletes.materializeEqDeletes(spark, root)
    assert(v.nonEmpty)
    assert(snap(root) === expect, "materialization must not change rows")
    val m = AtomicCommit.readManifest(root).get
    assert(!m.entries.contains("Z"),
      "a partition the resolution proves empty folds out")
    assert(AtomicCommit.dvOf(m.entries("A")).nonEmpty, "fresh bitmap for A")
    // the face re-qualifies on bitmap-only evidence and reads parity
    val scan = face().getOrElse(fail("bitmap-only evidence must re-qualify"))
    assert(scan.planInputPartitions().nonEmpty)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.mat_eq", root)
    try {
      val got = withSQLConf(
          graft.sources.GraftBatchScan.EnabledConf -> "true") {
        val d = spark.sql("SELECT k, flag, v FROM graft.mat_eq")
        val plan = d.queryExecution.executedPlan.toString
        val rows = d.as[(Long, String, Long)].collect().toSet
        assert(plan.contains("BatchScan"),
          s"expected the batch face after materialization\n$plan")
        rows
      }
      assert(got === expect)
    } finally spark.conf.unset("spark.graft.table.mat_eq")

    // nothing left to materialize; history and time travel intact
    assert(Deletes.materializeEqDeletes(spark, root) === None)
    assert(AtomicCommit.readAt(spark, root, 1L).count() === 8L)
  }

  test("materializeEqDeletes follows the column-rename chain") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    AtomicCommit.publish(root, store, AtomicCommit.stage(spark, root, store,
      Seq((1L, "A", 10L), (2L, "A", 20L), (3L, "B", 30L))
        .toDF("k", "flag", "v"), "flag", 1))
    // the record carries its DELETE-TIME name "k"; the logical view the
    // materializer scans speaks the renamed "id" — a raw-record filter
    // would crash UNRESOLVED_COLUMN (or worse, match a different column)
    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(2L)).nonEmpty)
    AtomicCommit.renameColumn(spark, root, store, "k", "id")
    assert(Deletes.materializeEqDeletes(spark, root).nonEmpty)
    assert(AtomicCommit.read(spark, root)
      .select("id").as[Long].collect().toSet === Set(1L, 3L))
    assert(Deletes.materializeEqDeletes(spark, root) === None)
  }

  test("deleteKeysMoR commits with ZERO data scan: survives missing data files") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    val staged = AtomicCommit.stage(spark, root, store,
      Seq((1L, "A", 10L), (2L, "B", 20L), (3L, "C", 30L))
        .toDF("k", "flag", "v"), "flag", 1)
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, store, staged)
    // the brutal proof: physically remove every data file except one
    // (the schema probe reads a single footer); any matching SCAN would
    // die here — the equality delete must not even try
    val m = AtomicCommit.readManifest(root).get
    val gen = AtomicCommit.ownersOf(m.entries.head._2).head
    val files = Seq("A", "B", "C").flatMap { p =>
      Option(java.nio.file.Paths.get(s"$root/$gen/flag=$p").toFile.listFiles)
        .get.filter(_.getName.endsWith(".parquet")).toSeq
    }
    files.drop(1).foreach(f => Files.delete(f.toPath))
    assert(Deletes.deleteKeysMoR(spark, root, "k", Seq(2L)) === Some(2L))
    // the record landed on exactly the bloom-admitted partition
    val m2 = AtomicCommit.readManifest(root).get
    assert(AtomicCommit.dvOf(m2.entries("B")).nonEmpty)
    assert(AtomicCommit.dvOf(m2.entries("C")).isEmpty,
      "bloom-rejected partitions must not carry the record")
  }

  test("deletes on ESCAPED partition names: CoW and MoR, raw keys vs decoded rows") {
    import spark.implicits._
    // copy-on-write: rows collect DECODED ('a/b'); the manifest speaks
    // RAW ('a%2Fb') — rewrites and drops must land on the right entries
    val cowRoot = Files.createTempDirectory("graft_del_esc_cow").toString
    AtomicCommit.commitReplacePartitions(spark, cowRoot,
      ((1L to 4L).map(i => (i, "a/b")) ++ (11L to 12L).map(i => (i, "x=y"))
        ++ (21L to 22L).map(i => (i, "ok"))).toDF("k", "p"), "p")
    // partial delete in a/b (rewrite), full delete of x=y (drop)
    assert(Deletes.deleteWhere(spark, cowRoot,
      col("k") <= 3L || col("k") >= 11L && col("k") <= 12L).nonEmpty)
    val m = AtomicCommit.readManifest(cowRoot).get
    assert(m.entries.keySet === Set("a%2Fb", "ok"),
      s"x=y must drop, a/b must survive rewritten: ${m.entries.keySet}")
    assert(AtomicCommit.read(spark, cowRoot).select("k").as[Long]
      .collect().toSet === Set(4L, 21L, 22L))

    // merge-on-read: the vector's __dv_partition is decoded; entry
    // edits, carried evidence, and emptied-partition drops are raw
    val morRoot = Files.createTempDirectory("graft_del_esc_mor").toString
    AtomicCommit.commitReplacePartitions(spark, morRoot,
      ((1L to 4L).map(i => (i, "a/b")) ++ (21L to 22L).map(i => (i, "ok")))
        .toDF("k", "p"), "p")
    assert(Deletes.deleteWhereMoR(spark, morRoot, col("k") === 1L).nonEmpty)
    val m1 = AtomicCommit.readManifest(morRoot).get
    assert(AtomicCommit.dvOf(m1.entries("a%2Fb")).nonEmpty,
      "the vector must attach to the raw entry key")
    // a second MoR delete re-homes (CARRIES) the first vector — the
    // decoded-probe mapping must keep k=1 deleted
    assert(Deletes.deleteWhereMoR(spark, morRoot, col("k") === 2L).nonEmpty)
    assert(AtomicCommit.read(spark, morRoot).select("k").as[Long]
      .collect().toSet === Set(3L, 4L, 21L, 22L))
    // emptying the escaped partition drops its raw entry
    assert(Deletes.deleteWhereMoR(spark, morRoot,
      col("k") === 3L || col("k") === 4L).nonEmpty)
    assert(AtomicCommit.readManifest(morRoot).get.entries.keySet === Set("ok"))
    assert(AtomicCommit.read(spark, morRoot).select("k").as[Long]
      .collect().toSet === Set(21L, 22L))
  }

  test("MoR position delete in the NULL partition applies — bitmap path AND legacy anti-join") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_del_null").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, Some("A")), (2L, Some("A")), (3L, None), (4L, None))
        .toDF("k", "p"), "p")
    assert(Deletes.deleteWhereMoR(spark, root, col("k") === 3L).nonEmpty)
    def liveKeys() = AtomicCommit.read(spark, root)
      .select("k").as[Long].collect().toSet
    assert(liveKeys() === Set(1L, 2L, 4L),
      "the null partition's marked row must not survive (bitmap path)")
    // legacy path: tables whose vectors predate the bitmap sidecar —
    // remove the sidecar, the anti-join must be NULL-SAFE on the key
    val m = AtomicCommit.readManifest(root).get
    val dvGen = m.entries.values.flatMap(AtomicCommit.dvOf).head
    val dvb = java.nio.file.Paths.get(root, dvGen, "_dvb")
    assert(Files.isDirectory(dvb), "expected a bitmap sidecar to remove")
    val s = Files.walk(dvb)
    try s.sorted(java.util.Comparator.reverseOrder())
      .forEach(f => Files.delete(f))
    finally s.close()
    assert(liveKeys() === Set(1L, 2L, 4L),
      "the anti-join fallback must be null-safe on the partition value")
  }
}
