package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping}

/** [[graft.plans.GraftSqlParser]] — OPTIMIZE / VACUUM as real SQL
  * statements through the injected parser; everything the extension
  * doesn't own must pass through Spark's parser verbatim.
  */
class GraftSqlParserSpec extends SparkSpec {
  import spark.implicits._

  private def dataFiles(root: String): Int = {
    val m = AtomicCommit.readManifest(root).get
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try {
      val live = m.entries.values.flatMap(AtomicCommit.ownersOf).toSet
      s.filter(f => f.toString.endsWith(".parquet") &&
          !f.toString.contains("_graft") &&
          live.exists(g => f.toString.contains(s"/$g/")))
        .count().toInt
    } finally s.close()
  }

  test("OPTIMIZE compacts; OPTIMIZE ZORDER BY reclusters; result row reports files") {
    val root = Files.createTempDirectory("graft_sqlopt").toString
    // several appends → multi-generation small files worth compacting
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 40L).map(i => (i, i % 97, (i % 4).toString))
        .toDF("k", "v", "p"), "p")
    for (b <- 1 to 3)
      AtomicCommit.commitAppendPartitions(spark, root,
        (0L until 20L).map(i => (1000L * b + i, i % 97, (i % 4).toString))
          .toDF("k", "v", "p"), "p", 1)
    spark.conf.set("spark.graft.table.opt", root)
    try {
      val before = dataFiles(root)
      val row = spark.sql("OPTIMIZE graft.opt").collect().head
      assert(row.getLong(0) === before.toLong)
      assert(row.getLong(1) < row.getLong(0),
        s"compaction must shrink the file count: $row")
      assert(AtomicCommit.read(spark, root).count() === 100L)
      // z-order over (k, v): runs, preserves rows, bumps the version
      val v0 = AtomicCommit.readManifest(root).get.version
      spark.sql("OPTIMIZE graft.opt ZORDER BY (k, v)").collect()
      assert(AtomicCommit.readManifest(root).get.version > v0)
      assert(AtomicCommit.read(spark, root).count() === 100L)
      // single column = plain recluster
      spark.sql("OPTIMIZE graft.opt ZORDER BY (k)").collect()
      assert(AtomicCommit.read(spark, root).count() === 100L)
    } finally spark.conf.unset("spark.graft.table.opt")
  }

  test("OPTIMIZE ... BLOOM FOR annotates per-file blooms on a non-sort column") {
    val root = Files.createTempDirectory("graft_sqloptb").toString
    // id is a distinct key interleaved across the k-sorted layout: only
    // a per-file bloom can tell the output files apart on it
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 4000L).map(i => (i % 40, i * 1000L + 7L, "A"))
        .toDF("k", "id", "p"), "p")
    spark.conf.set("spark.graft.table.optb", root)
    try {
      spark.sql("OPTIMIZE graft.optb ZORDER BY (k) BLOOM FOR (id)").collect()
      val m = AtomicCommit.readManifest(root).get
      val gen = AtomicCommit.ownersOf(m.entries("A")).head
      assert(DataSkipping.readBlooms(root, gen).exists(_.col == "id"),
        "BLOOM FOR must write bloom sidecars")
      val probe = DataSkipping.readWhereEq(spark, root, "id", 1234007L)
      assert(probe.count() === 1L)
      // the 2-4 col z-order form accepts the clause too
      spark.sql("OPTIMIZE graft.optb ZORDER BY (k, id) BLOOM FOR (id)")
        .collect()
      assert(AtomicCommit.read(spark, root).count() === 4000L)
    } finally spark.conf.unset("spark.graft.table.optb")
  }

  test("OPTIMIZE ... MATERIALIZE DELETES resolves equality records into bitmaps") {
    val root = Files.createTempDirectory("graft_sqlmat").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 30L).map(i => (i, i * 2, (i % 3).toString))
        .toDF("k", "v", "p"), "p")
    spark.conf.set("spark.graft.table.mat", root)
    try {
      graft.sources.Deletes.deleteKeysMoR(spark, root, "k", Seq(4L, 7L))
      val r = spark.sql("OPTIMIZE graft.mat MATERIALIZE DELETES").collect()
      assert(r.length === 1 && r.head.getBoolean(0),
        "outstanding records must materialize")
      assert(AtomicCommit.read(spark, root).count() === 28L)
      // evidence is now bitmap-shaped: entries reference a vector gen
      val m = AtomicCommit.readManifest(root).get
      assert(m.entries.values.exists(e => AtomicCommit.dvOf(e).nonEmpty))
      // nothing outstanding (records gone — else this would re-resolve):
      // (false, null), no version burned
      val v0 = AtomicCommit.currentVersion(root)
      val r2 = spark.sql("OPTIMIZE graft.mat MATERIALIZE DELETES").collect()
      assert(!r2.head.getBoolean(0) && r2.head.isNullAt(1))
      assert(AtomicCommit.currentVersion(root) === v0)
    } finally spark.conf.unset("spark.graft.table.mat")
  }

  test("VACUUM RETAIN n VERSIONS keeps the horizon; plain VACUUM keeps 1") {
    val root = Files.createTempDirectory("graft_sqlvac").toString
    for (v <- 1 to 4)
      AtomicCommit.commitReplacePartitions(spark, root,
        Seq((v.toLong, "A")).toDF("k", "p"), "p")
    spark.conf.set("spark.graft.table.vac", root)
    try {
      // orphan age 0 is not expressible in the SQL form (deliberately —
      // it is a test-only hazard); exercise retention via manifests kept
      spark.sql("VACUUM graft.vac RETAIN 3 VERSIONS").collect()
      // the three newest snapshots stay readable
      for (v <- 2L to 4L)
        assert(AtomicCommit.readAt(spark, root, v).count() === 1L)
      intercept[Exception] { AtomicCommit.readAt(spark, root, 1L).collect() }
      spark.sql("VACUUM graft.vac").collect()
      assert(AtomicCommit.readAt(spark, root, 4L).count() === 1L)
      intercept[Exception] { AtomicCommit.readAt(spark, root, 3L).collect() }
      // RETAIN HOURS: everything committed within the window survives
      spark.sql("VACUUM graft.vac RETAIN 24 HOURS").collect()
      assert(AtomicCommit.readAt(spark, root, 4L).count() === 1L)
    } finally spark.conf.unset("spark.graft.table.vac")
  }

  test("non-maintenance SQL passes through verbatim; bad targets fail loudly") {
    // ordinary queries and DDL still parse through Spark's parser
    assert(spark.sql("SELECT 1 + 1 AS x").as[Int].head() === 2)
    assert(spark.sql("SELECT 'OPTIMIZE graft.docs' AS s").as[String].head()
      === "OPTIMIZE graft.docs")
    // unregistered table: loud registry error, not a parse error
    val e = intercept[RuntimeException] {
      spark.sql("OPTIMIZE graft.nosuch").collect()
    }
    assert(e.getMessage.contains("spark.graft.table.nosuch"))
  }

  test("trailing semicolons parse; near-miss maintenance fails with the graft grammar") {
    val root = Files.createTempDirectory("graft_sqlsemi").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    spark.conf.set("spark.graft.table.semi", root)
    try {
      // the shapes an interactive SQL client actually sends
      spark.sql("OPTIMIZE graft.semi;").collect()
      spark.sql("VACUUM graft.semi RETAIN 5 VERSIONS ;  ").collect()
      assert(AtomicCommit.read(spark, root).count() === 2L)
      // near-misses fail with the supported grammar, not Spark's
      // unrelated PARSE_SYNTAX_ERROR: unsupported retention unit…
      val e1 = intercept[RuntimeException] {
        spark.sql("VACUUM graft.semi RETAIN 3 DAYS")
      }
      assert(e1.getMessage.contains("supported forms"), e1.getMessage)
      // …and a graft-targeted OPTIMIZE shape the grammar doesn't own
      val e2 = intercept[RuntimeException] {
        spark.sql("OPTIMIZE graft.semi ZORDER (k)") // missing BY
      }
      assert(e2.getMessage.contains("supported forms"), e2.getMessage)
      // the same keywords over NON-graft targets are not ours: they pass
      // to the delegate parser chain (here: Spark, which rejects them
      // with its own parse error, NOT our grammar message) — another
      // extension in the chain would get its OPTIMIZE/VACUUM back
      val e3 = intercept[Exception] {
        spark.sql("OPTIMIZE delta_tbl ZORDER BY (k)")
      }
      assert(!e3.getMessage.contains("supported forms"), e3.getMessage)
      val e4 = intercept[Exception] {
        spark.sql("VACUUM other_catalog.tbl RETAIN 168 HOURS")
      }
      assert(!e4.getMessage.contains("supported forms"), e4.getMessage)
      // a maintenance keyword INSIDE ordinary SQL still passes through
      assert(spark.sql("SELECT 'VACUUM graft.semi RETAIN 3 DAYS' AS s")
        .as[String].head().contains("3 DAYS"))
    } finally spark.conf.unset("spark.graft.table.semi")
  }

  test("ANALYZE TABLE: retrofits NDV sidecars, no-op re-run, incremental appends") {
    val root = Files.createTempDirectory("graft_sqlanalyze").toString
    // a PLAIN commit — no stats sidecars anywhere
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 100L).map(i => (i, i % 7, (i % 3).toString))
        .toDF("k", "v", "p"), "p")
    spark.conf.set("spark.graft.table.az", root)
    try {
      val m0 = AtomicCommit.readManifest(root).get
      assert(graft.sources.TableStats
        .columnStats(root, m0, "k", m0.entries.keySet).isEmpty,
        "no evidence before ANALYZE")
      // no FOR clause = every supported non-partition column; returns the
      // table-level stats the planner now feeds from
      val got = spark.sql("ANALYZE TABLE graft.az COMPUTE STATISTICS")
        .collect().map(r => r.getString(0) ->
          ((r.getLong(1), r.getLong(3), r.getString(4), r.getString(5)))).toMap
      assert(got.keySet === Set("k", "v"))
      assert(got("k")._1 === 100L && got("k")._3 === "0" && got("k")._4 === "99")
      assert(got("v")._2 >= 7L && got("v")._2 <= 21L,
        s"v NDV ${got("v")._2}: summed-HLL upper bound stays in range")
      // ONE metadata commit; evidence reaches the snapshot caches
      val m1 = AtomicCommit.readManifest(root).get
      assert(m1.version === m0.version + 1)
      assert(AtomicCommit.history(root).last.kind === "metadata")
      assert(graft.sources.TableStats
        .columnStats(root, m1, "k", m1.entries.keySet).exists(_.rows == 100L))
      // re-run: evidence complete, NO version burned
      spark.sql("ANALYZE TABLE graft.az COMPUTE STATISTICS").collect()
      assert(AtomicCommit.readManifest(root).get.version === m1.version)
      // an un-annotated append, then FOR COLUMNS: only new evidence lands
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((200L, 99L, "0")).toDF("k", "v", "p"), "p", 1)
      val after = spark
        .sql("ANALYZE TABLE graft.az COMPUTE STATISTICS FOR COLUMNS k")
        .collect().map(r => (r.getLong(1), r.getString(5))).head
      assert(after === ((101L, "200")))
      // guards: partition column, unknown column, near-miss grammar
      assert(intercept[Exception] {
        spark.sql("ANALYZE TABLE graft.az COMPUTE STATISTICS FOR COLUMNS p")
      }.getMessage.contains("partition column"))
      assert(intercept[Exception] {
        spark.sql("ANALYZE TABLE graft.az COMPUTE STATISTICS FOR COLUMNS zz")
      }.getMessage.contains("no column zz"))
      assert(intercept[Exception] {
        spark.sql("ANALYZE TABLE graft.az COMPUTE STATISTICS NOSCAN")
      }.getMessage.contains("supported forms"))
    } finally spark.conf.unset("spark.graft.table.az")
  }

  test("re-ANALYZE of the SAME columns after new data refreshes the cached stats") {
    val root = Files.createTempDirectory("graft_sqlreanalyze").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 50L).map(i => (i, (i % 2).toString)).toDF("k", "p"), "p")
    spark.conf.set("spark.graft.table.rz", root)
    try {
      spark.sql("ANALYZE TABLE graft.rz COMPUTE STATISTICS FOR COLUMNS k")
      // new data lands (un-annotated generation)…
      AtomicCommit.commitAppendPartitions(spark, root,
        (100L until 120L).map(i => (i, "0")).toDF("k", "p"), "p", 1)
      // …and the planner asks for stats BEFORE the re-analyze: evidence
      // is incomplete, so None — which the snapshot cache remembers
      val mid = AtomicCommit.readManifest(root).get
      assert(graft.sources.TableStats
        .columnStats(root, mid, "k", mid.entries.keySet).isEmpty)
      // the re-ANALYZE of the IDENTICAL column list is a props-only
      // commit (entries unchanged); the marker VALUE must still move, or
      // the cached None above is returned forever and this very command
      // reports zeros
      val again = spark
        .sql("ANALYZE TABLE graft.rz COMPUTE STATISTICS FOR COLUMNS k")
        .collect().head
      assert(again.getLong(1) === 70L, s"re-analyze saw ${again.getLong(1)} rows")
      val m2 = AtomicCommit.readManifest(root).get
      assert(graft.sources.TableStats
        .columnStats(root, m2, "k", m2.entries.keySet).exists(_.rows == 70L))
    } finally spark.conf.unset("spark.graft.table.rz")
  }

  test("DESCRIBE DETAIL: one-row operational metadata, mapping state included") {
    val root = Files.createTempDirectory("graft_sqldetail").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10, "A"), (2L, 20, "B")).toDF("k", "v", "p"), "p")
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, 30, "A")).toDF("k", "v", "p"), "p", 1)
    AtomicCommit.addConstraint(spark, root, "v_pos", "v > 0")
    val store = new graft.sources.PosixManifestStore(root)
    AtomicCommit.renameColumn(spark, root, store, "v", "w")
    AtomicCommit.widenColumn(spark, root, store, "w",
      org.apache.spark.sql.types.LongType)
    spark.conf.set("spark.graft.table.dd", root)
    try {
      val r = spark.sql("DESCRIBE DETAIL graft.dd").collect().head
      assert(r.getAs[String]("format") === "graft")
      assert(r.getAs[String]("location") === root)
      assert(r.getAs[String]("partition_col") === "p")
      assert(r.getAs[String]("partition_spec") == null,
        "identity-partitioned tables carry no transform spec")
      assert(r.getAs[Long]("version") ===
        AtomicCommit.readManifest(root).get.version)
      assert(r.getAs[String]("committed_at") != null)
      assert(r.getAs[Long]("num_partitions") === 2L)
      assert(r.getAs[Long]("num_files") >= 3L) // replace + append gens
      assert(r.getAs[Long]("size_bytes") > 0L)
      assert(r.getAs[Long]("num_generations") === 2L)
      assert(r.getAs[String]("constraints").contains("v_pos"))
      assert(r.getAs[String]("renamed_columns") === "v>w")
      assert(r.getAs[String]("widened_columns") === "w>BIGINT")
      assert(r.getAs[String]("dropped_columns") == null)
      // wait — the rename rewrote the constraint to w; re-check text
      assert(r.getAs[String]("constraints").contains("w"))
      // fresh table: no sort order in effect, no delete evidence
      assert(r.getAs[String]("sort_order") == null)
      assert(r.getAs[Long]("num_delete_vectors") === 0L)
      assert(r.getAs[Long]("num_equality_deletes") === 0L)
      // DESC shorthand; malformed DETAIL fails with the graft grammar
      assert(spark.sql("DESC DETAIL graft.dd").count() === 1L)
      assert(intercept[Exception] {
        spark.sql("DESCRIBE DETAIL graft.dd AS OF 3")
      }.getMessage.contains("supported forms"))
    } finally spark.conf.unset("spark.graft.table.dd")
  }

  test("DESCRIBE DETAIL tracks sort order and delete-evidence state through their lifecycle") {
    val root = Files.createTempDirectory("graft_sqldd2").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 20L).map(i => (i, i * 3, (i % 2).toString))
        .toDF("k", "v", "p"), "p")
    spark.conf.set("spark.graft.table.dd2", root)
    def detail() = spark.sql("DESCRIBE DETAIL graft.dd2").collect().head
    try {
      // recluster stamps provenance: the sort order is IN EFFECT
      graft.sources.Compaction.recluster(spark, root, Seq("v"))
      assert(detail().getAs[String]("sort_order") === "v")
      // an equality delete marks every admitted partition and shows up
      graft.sources.Deletes.deleteKeysMoR(spark, root, "k", Seq(4L, 5L))
      val d1 = detail()
      assert(d1.getAs[Long]("num_delete_vectors") > 0L)
      assert(d1.getAs[Long]("num_equality_deletes") === 2L)
      // the MoR delete keeps owners — sort order survives
      assert(d1.getAs[String]("sort_order") === "v")
      // materialization: records gone, vectors (bitmaps) remain
      spark.sql("OPTIMIZE graft.dd2 MATERIALIZE DELETES").collect()
      val d2 = detail()
      assert(d2.getAs[Long]("num_equality_deletes") === 0L)
      assert(d2.getAs[Long]("num_delete_vectors") > 0L)
      assert(d2.getAs[String]("sort_order") === "v")
      // an append retires the ordering claim
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((100L, 1L, "0")).toDF("k", "v", "p"), "p")
      assert(detail().getAs[String]("sort_order") == null)
    } finally spark.conf.unset("spark.graft.table.dd2")
  }

  test("DESCRIBE DETAIL reports the hidden-partitioning transform spec") {
    val root = Files.createTempDirectory("graft_sqldd_spec").toString
    graft.sources.HiddenPartitioning.commitReplace(spark, root,
      (0 until 20).map(i => (i.toLong, s"v$i")).toDF("k", "s"),
      graft.sources.HiddenPartitioning.Bucket(4, "k"))
    spark.conf.set("spark.graft.table.ddspec", root)
    try {
      val r = spark.sql("DESCRIBE DETAIL graft.ddspec").collect().head
      assert(r.getAs[String]("partition_col") === "k_bucket")
      assert(r.getAs[String]("partition_spec") === "bucket(4,k)")
    } finally spark.conf.unset("spark.graft.table.ddspec")
  }

  test("DESCRIBE DETAIL num_files counts LIVE files only (superseded partition dirs excluded)") {
    val root = Files.createTempDirectory("graft_sqldetail_live").toString
    // gen1 owns A and B; the replace moves B to gen2 but gen1's p=B
    // directory stays on disk until vacuum — num_files must not count
    // it (size_bytes never did, and the two columns must agree)
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((20L, "B")).toDF("k", "p"), "p")
    val m = AtomicCommit.readManifest(root).get
    val superseded = java.nio.file.Paths.get(root, m.entries("A"), "p=B")
    assert(java.nio.file.Files.isDirectory(superseded),
      "premise: the superseded dir must still exist on disk")
    spark.conf.set("spark.graft.table.ddl2", root)
    try {
      val r = spark.sql("DESCRIBE DETAIL graft.ddl2").collect().head
      assert(r.getAs[Long]("num_files") === 2L,
        "one live file per live (gen, partition) dir")
      assert(r.getAs[Long]("num_partitions") === 2L)
    } finally spark.conf.unset("spark.graft.table.ddl2")
  }

  test("DESCRIBE HISTORY: the commit log as a result set, newest first") {
    val root = Files.createTempDirectory("graft_sqlhist").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "B")).toDF("k", "p"), "p", 1)
    AtomicCommit.tag(root, "snap", 1L)
    spark.conf.set("spark.graft.table.hist", root)
    try {
      val rows = spark.sql("DESCRIBE HISTORY graft.hist").collect()
      assert(rows.map(_.getLong(0)).toSeq === Seq(3L, 2L, 1L), "newest first")
      val byV = rows.map(r => r.getLong(0) ->
        ((r.getString(2), r.getString(4)))).toMap
      assert(byV(1L)._1 === "replace")
      assert(byV(2L) === (("append", "B")))
      assert(byV(3L)._1 === "metadata")
      // every retained commit carries its monotonic timestamp
      assert(rows.forall(_.getString(1) != null))
      // DESC shorthand parses; plain DESCRIBE TABLE still belongs to Spark
      assert(spark.sql("DESC HISTORY graft.hist").count() === 3L)
      val e = intercept[RuntimeException] {
        spark.sql("DESCRIBE HISTORY graft.hist SINCE 2")
      }
      assert(e.getMessage.contains("supported forms"), e.getMessage)
    } finally spark.conf.unset("spark.graft.table.hist")
  }
}
