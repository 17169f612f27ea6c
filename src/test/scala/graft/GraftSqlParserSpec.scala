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
      // …and an OPTIMIZE shape the grammar doesn't own
      val e2 = intercept[RuntimeException] {
        spark.sql("OPTIMIZE INDEX something ON t")
      }
      assert(e2.getMessage.contains("supported forms"), e2.getMessage)
      // a maintenance keyword INSIDE ordinary SQL still passes through
      assert(spark.sql("SELECT 'VACUUM graft.semi RETAIN 3 DAYS' AS s")
        .as[String].head().contains("3 DAYS"))
    } finally spark.conf.unset("spark.graft.table.semi")
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
