package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes, TableStats}

/** [[graft.sources.TableStats]] — manifest-backed planner statistics.
  * The defect this closes: without a size estimate Spark prices every
  * external relation at `defaultSizeInBytes` (effectively infinite), so
  * a SQL join against a tiny graft dimension table NEVER auto-broadcasts.
  * With it, the planner sees the snapshot's true file bytes (v1 face)
  * and the PRUNED slice's bytes+rows (DSv2 catalog face).
  */
class TableStatsSpec extends SparkSpec {
  import spark.implicits._

  private def diskBytes(root: String): Long = {
    val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
    try s.filter(f => f.toString.endsWith(".parquet") &&
        !f.toString.contains("_graft") &&
        java.nio.file.Files.isRegularFile(f))
      .mapToLong(java.nio.file.Files.size).sum()
    finally s.close()
  }

  test("sizeInBytes = live parquet bytes; rowCount from sidecars; DVs drop rowCount") {
    val root = Files.createTempDirectory("graft_ts").toString
    DataSkipping.commitWithStats(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "B")).toDF("k", "v", "p"),
      "p", Seq("k"))
    val m1 = AtomicCommit.readManifest(root).get
    assert(TableStats.sizeInBytes(root, m1) > 0L)
    assert(TableStats.sizeInBytes(root, m1) === diskBytes(root))
    assert(TableStats.rowCount(root, m1) === Some(3L))
    assert(TableStats.rowCount(root, m1, Set("A")) === Some(2L))
    // partition-subset bytes: strictly less than the whole snapshot
    assert(TableStats.sizeInBytes(root, m1, Set("A")) <
      TableStats.sizeInBytes(root, m1))
    // a MoR delete leaves bytes intact (files still read) but makes the
    // physical row count a lie — rowCount must refuse, bytes must not
    Deletes.deleteWhereMoR(spark, root, col("k") === 1L)
    val m2 = AtomicCommit.readManifest(root).get
    assert(TableStats.rowCount(root, m2).isEmpty)
    assert(TableStats.rowCount(root, m2, Set("B")) === Some(1L),
      "the DV-free partition still proves its count")
    assert(TableStats.sizeInBytes(root, m2) >= TableStats.sizeInBytes(root, m1))
  }

  test("the generation column rollup answers whole-table columnStats exactly; any gap falls back to the sidecar parse") {
    // two identical tables, one stripped of its rollup sidecars: the
    // O(generations) fast path and the O(partitions) exact parse must
    // return the SAME ColumnStats (rows, ndv, bounds, kind)
    def build(): String = {
      val root = Files.createTempDirectory("graft_ts_roll").toString
      DataSkipping.commitWithStats(spark, root,
        (0 until 600).map(i => (i.toLong, (i % 37).toLong,
          Seq("A", "B", "C", "a/b")(i % 4))).toDF("k", "v", "p"),
        "p", Seq("k", "v"))
      // an APPEND (then ANALYZE-annotated) so the whole-table combine
      // spans two generations, exercising the cross-generation sum
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((1000L, 999L, "A"), (1001L, 998L, "B")).toDF("k", "v", "p"), "p")
      DataSkipping.analyze(spark, root,
        AtomicCommit.readManifest(root).get, Seq("k", "v"))
      root
    }
    val fast = build()
    val slow = build()
    val mS = AtomicCommit.readManifest(slow).get
    for (g <- mS.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct;
         p = java.nio.file.Paths.get(slow, g, DataSkipping.ColSumFile)
         if Files.exists(p)) Files.delete(p)
    val mF = AtomicCommit.readManifest(fast).get
    for (c <- Seq("k", "v")) {
      val got = TableStats.columnStats(fast, mF, c, mF.entries.keySet)
      val expect = TableStats.columnStats(slow, mS, c, mS.entries.keySet)
      assert(got === expect, s"rollup and exact disagree on $c")
      assert(got.nonEmpty && got.get.rows === 602L)
    }
    // a PARTIAL-ownership snapshot refuses the rollup and stays exact:
    // replace one partition, then whole-table stats on the new manifest
    AtomicCommit.commitReplacePartitions(spark, fast,
      Seq((5000L, 5L, "C")).toDF("k", "v", "p"), "p")
    val mF2 = AtomicCommit.readManifest(fast).get
    val after = TableStats.columnStats(fast, mF2, "k", mF2.entries.keySet)
    // the new C generation is un-annotated → the exact path refuses
    // (None); gen1's rollup no longer matches its shrunken owned set
    // (psig), so the rollup must not fabricate an answer either
    assert(after.isEmpty,
      "a partially-owned generation must not validate its rollup")
  }

  test("NDV selectivity: selective predicates price within 2× of actual row counts") {
    val root = Files.createTempDirectory("graft_ts_ndv").toString
    // 1000 unique keys, a 50-distinct value column, 4 partitions;
    // commitWithStats annotates min/max AND the HLL ndv per slice
    DataSkipping.commitWithStats(spark, root,
      (0L until 1000L).map(i => (i, i % 50, (i % 4).toString))
        .toDF("k", "v", "p"), "p", Seq("k", "v"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.sel", root)
    try {
      def scanRows(sql: String): Long = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        val scans = plan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan
        }
        assert(scans.nonEmpty, s"no v2 scan in:\n$plan")
        val stats = scans.head match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
          case s =>
            s.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
        }
        stats.numRows.getAsLong
      }
      // equality on the unique column: actual 1 — rows/NDV prices it ≈ 1
      val eq = scanRows("SELECT * FROM graft.sel WHERE k = 5")
      assert(eq >= 1L && eq <= 2L, s"k=5 priced at $eq rows (actual 1)")
      // equality on the 50-distinct column: actual 20; the summed-HLL NDV
      // over-counts values spanning partitions, so the estimate is LOW —
      // conservative, but must stay in the right order of magnitude
      val eq50 = scanRows("SELECT * FROM graft.sel WHERE v = 7")
      assert(eq50 >= 5L && eq50 <= 40L, s"v=7 priced at $eq50 rows (actual 20)")
      // closed range covering ~20% of [0, 999]: actual 200, within 2×
      val rng = scanRows("SELECT * FROM graft.sel WHERE k BETWEEN 100 AND 299")
      assert(rng >= 100L && rng <= 400L, s"range priced at $rng rows (actual 200)")
      // no predicate: the exact sidecar-backed count, never a guess
      assert(scanRows("SELECT * FROM graft.sel") === 1000L)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.sel")
    }
  }

  test("analyze merges evidence: other columns kept, ndv-less records refreshed") {
    val root = Files.createTempDirectory("graft_ts_an").toString
    // commitWithStats annotates k only; v has NO evidence
    DataSkipping.commitWithStats(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "B")).toDF("k", "v", "p"),
      "p", Seq("k"))
    val m = AtomicCommit.readManifest(root).get
    val gen = AtomicCommit.ownersOf(m.entries("A")).head
    val kBefore = DataSkipping.readStats(root, gen).filter(_.col == "k")
    // analyze v: ONE sidecar rewritten, k's records survive verbatim
    assert(DataSkipping.analyze(spark, root, m, Seq("v")) === 1)
    val after = DataSkipping.readStats(root, gen)
    assert(after.filter(_.col == "k") === kBefore,
      "k evidence must survive an analyze of v untouched")
    val vA = after.find(s => s.col == "v" && s.partition == "A" && s.file.isEmpty).get
    assert(vA.min === Some("10") && vA.max === Some("20") && vA.ndv === Some(2L))
    // k predates histograms (commitWithStats writes none): ONE retrofit
    // pass, then complete evidence — nothing rewritten on the re-run
    assert(DataSkipping.analyze(spark, root, m, Seq("k", "v")) === 1)
    assert(DataSkipping.analyze(spark, root, m, Seq("k", "v")) === 0)
    // an r14-era sidecar (records without the ndv field) counts as
    // missing evidence and is refreshed in place with identical bounds
    val p = java.nio.file.Paths.get(root, gen, DataSkipping.StatsFile)
    val stripped = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
      .replaceAll(",\"ndv\":\\d+", "")
    java.nio.file.Files.write(p, stripped.getBytes("UTF-8"))
    assert(DataSkipping.readStats(root, gen).forall(_.ndv.isEmpty))
    assert(DataSkipping.analyze(spark, root, m, Seq("k")) === 1)
    val kAfter = DataSkipping.readStats(root, gen)
      .filter(s => s.col == "k" && s.file.isEmpty)
    assert(kAfter.forall(_.ndv.isDefined))
    assert(kAfter.map(s => (s.partition, s.min, s.max, s.rows)).toSet ===
      kBefore.filter(_.file.isEmpty)
        .map(s => (s.partition, s.min, s.max, s.rows)).toSet)
    // a schema-evolved column with no data anywhere: skipped, no error
    AtomicCommit.addColumns(root, new graft.sources.PosixManifestStore(root),
      org.apache.spark.sql.types.StructType.fromDDL("note STRING"))
    assert(DataSkipping.analyze(spark, root,
      AtomicCommit.readManifest(root).get, Seq("note")) === 0)
  }

  test("branch lineages at the SAME version number get their own stats") {
    val root = Files.createTempDirectory("graft_ts_br").toString
    val main = new graft.sources.PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root, main,
      Seq((1L, "A")).toDF("k", "p"), "p", 1)
    AtomicCommit.createBranch(root, main, "dev")
    val dev = new graft.sources.BranchStore(main, "dev")
    // diverge: the branch takes a fat append, main takes props-only
    // commits until the version NUMBERS collide — the r14 cache keyed on
    // (root, version) and served whichever lineage computed first
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      (0L until 5000L).map(i => (i, "B")).toDF("k", "p"), "p", 1)
    var mMain = AtomicCommit.readManifest(main).get
    val mDev = AtomicCommit.readManifest(dev).get
    while (mMain.version < mDev.version) {
      AtomicCommit.tag(root, main, s"pad${mMain.version}", mMain.version)
      mMain = AtomicCommit.readManifest(main).get
    }
    assert(mMain.version === mDev.version, "test premise: colliding versions")
    // main first (primes the cache), then the branch must NOT be served
    // main's numbers
    val mainBytes = TableStats.sizeInBytes(root, mMain)
    val devBytes = TableStats.sizeInBytes(root, mDev)
    assert(devBytes > mainBytes,
      s"branch bytes ($devBytes) must exceed main's ($mainBytes) — " +
        "a shared cache entry would equalize them")
  }

  test("rowCount absent when a generation is un-annotated") {
    val root = Files.createTempDirectory("graft_ts2").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A")).toDF("k", "p"), "p")
    val m = AtomicCommit.readManifest(root).get
    assert(TableStats.rowCount(root, m).isEmpty)
    assert(TableStats.sizeInBytes(root, m) > 0L)
  }

  test("v1 face: optimizer stats equal snapshot bytes; small graft dim auto-broadcasts") {
    val root = Files.createTempDirectory("graft_ts3").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "x", "A"), (2L, "y", "A"), (3L, "z", "B"))
        .toDF("k", "name", "p"), "p")
    val dim = spark.read.format("graft").load(root)
    val m = AtomicCommit.readManifest(root).get
    assert(dim.queryExecution.optimizedPlan.stats.sizeInBytes ===
      BigInt(TableStats.sizeInBytes(root, m)))
    // a fact side the planner KNOWS exceeds the threshold (range = 8 B/row)
    val fact = spark.range(400000).withColumnRenamed("id", "k")
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> (1024 * 1024).toString) {
      val joined = fact.join(dim, "k")
      val physical = joined.queryExecution.executedPlan.toString
      assert(physical.contains("BroadcastHashJoin"),
        s"tiny graft dim must broadcast under a 1 MB threshold:\n$physical")
      assert(!physical.contains("SortMergeJoin"), physical)
      assert(joined.count() === 3L)
    }
  }

  test("DSv2 catalog face: stats are filter-aware (pruned slice prices below the whole)") {
    val root = Files.createTempDirectory("graft_ts4").toString
    // partition A is ~100× partition B: pruning to B must change the price
    val big = spark.range(20000).select(col("id").as("k"),
      concat(lit("pad-pad-pad-"), col("id")).as("s"), lit("A").as("p"))
    val small = Seq((-1L, "tiny", "B"), (-2L, "tiny2", "B")).toDF("k", "s", "p")
    DataSkipping.commitWithStats(spark, root, big.unionByName(small), "p", Seq("k"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.st", root)
    try {
      // Spark's V1Scan bridge wraps the scan in V1ScanWrapper, which
      // drops SupportsReportStatistics (the defect BroadcastStatsRule
      // exists for) — so read the estimate off the wrapped scan itself
      def scanStats(sql: String): org.apache.spark.sql.connector.read.Statistics = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        val scans = plan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan
        }
        assert(scans.nonEmpty, s"no v2 scan in:\n$plan")
        scans.head match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
          case s =>
            s.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
        }
      }
      val whole = scanStats("SELECT * FROM graft.st")
      val slice = scanStats("SELECT * FROM graft.st WHERE p = 'B'")
      assert(whole.sizeInBytes.getAsLong > slice.sizeInBytes.getAsLong * 10,
        s"whole=${whole.sizeInBytes} slice=${slice.sizeInBytes}")
      assert(whole.numRows.getAsLong === 20002L)
      assert(slice.numRows.getAsLong === 2L)
      // and the pruned slice of an over-threshold table broadcasts
      // (BroadcastStatsRule turning the wrapped scan's estimate into the
      // join hint the bridge lost)
      withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "65536") {
        assert(whole.sizeInBytes.getAsLong > 65536L,
          "premise: the whole table must exceed the threshold")
        val fact = spark.range(400000).withColumnRenamed("id", "k")
        fact.createOrReplaceTempView("fact")
        val q = spark.sql(
          "SELECT f.k FROM fact f JOIN graft.st d ON f.k = d.k WHERE d.p = 'B'")
        val physical = q.queryExecution.executedPlan.toString
        assert(physical.contains("BroadcastHashJoin"),
          s"pruned slice under threshold must broadcast:\n$physical")
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.st")
    }
  }

  test("selectivity scales the BYTE price: a selective filter broadcasts a big table") {
    val root = Files.createTempDirectory("graft_ts_selbytes").toString
    // ONE partition (no partition pruning available) — only the NDV
    // selectivity can shrink the price. 20k padded rows, k unique.
    DataSkipping.commitWithStats(spark, root,
      spark.range(20000).select(col("id").as("k"),
        concat(lit("pad-pad-pad-pad-"), col("id")).as("s"),
        lit("A").as("p")), "p", Seq("k"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.sb", root)
    try withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "65536") {
      val rel = new graft.sources.GraftRelation(spark, root,
        new graft.sources.PosixManifestStore(root), None)
      assert(rel.sizeInBytes > 65536L,
        "premise: the unfiltered table must exceed the threshold")
      val fact = spark.range(400000).withColumnRenamed("id", "k")
      fact.createOrReplaceTempView("selfact")
      val q = spark.sql(
        "SELECT f.k FROM selfact f JOIN graft.sb d ON f.k = d.k WHERE d.k = 7")
      assert(q.queryExecution.executedPlan.toString
        .contains("BroadcastHashJoin"),
        s"selectivity-priced slice must broadcast:\n" +
          q.queryExecution.executedPlan.toString.take(2000))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.sb")
    }
  }

  test("join reorder: the selective small table joins before the big one") {
    val dir = Files.createTempDirectory("graft_ts_reorder")
    val (lRoot, mRoot, sRoot) =
      (s"$dir/L", s"$dir/M", s"$dir/S")
    DataSkipping.commitWithStats(spark, lRoot,
      spark.range(1000).select(col("id").as("k"),
        concat(lit("l-"), col("id")).as("lv"), lit("A").as("p")),
      "p", Seq("k"))
    DataSkipping.commitWithStats(spark, mRoot,
      spark.range(50000).select(col("id").as("k"),
        concat(lit("pad-pad-pad-"), col("id")).as("mv"), lit("A").as("p")),
      "p", Seq("k"))
    DataSkipping.commitWithStats(spark, sRoot,
      spark.range(10).select(col("id").as("k"),
        concat(lit("s-"), col("id")).as("sv"), lit("A").as("p")),
      "p", Seq("k"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.jl", lRoot)
    spark.conf.set("spark.graft.table.jm", mRoot)
    spark.conf.set("spark.graft.table.js", sRoot)
    val sql = """SELECT l.k, m.mv, s.sv FROM graft.jl l
                |JOIN graft.jm m ON l.k = m.k
                |JOIN graft.js s ON l.k = s.k""".stripMargin
    try {
      // written order joins the two big tables first; the rule moves the
      // selective small side down so the intermediate stays small
      val planOn = spark.sql(sql).queryExecution.optimizedPlan.toString
      val (si, mi) = (planOn.indexOf(s"graft.js"), planOn.indexOf(s"graft.jm"))
      assert(si >= 0 && mi >= 0, planOn.take(2000))
      assert(si < mi,
        s"small table must join below the big one:\n${planOn.take(2000)}")
      assert(spark.sql(sql).count() === 10L)
      // kill switch restores written order
      withSQLConf("spark.graft.joinReorder.enabled" -> "false") {
        val planOff = spark.sql(sql).queryExecution.optimizedPlan.toString
        assert(planOff.indexOf("graft.jm") < planOff.indexOf("graft.js"),
          s"disabled rule must keep written order:\n${planOff.take(2000)}")
        assert(spark.sql(sql).count() === 10L)
      }
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      Seq("jl", "jm", "js").foreach(n =>
        spark.conf.unset(s"spark.graft.table.$n"))
    }
  }

  test("n-way join reorder: a worst-first 4-table chain rebuilds selective-first; estimates honest") {
    val dir = Files.createTempDirectory("graft_ts_nway")
    val roots = Map("jf" -> 100000, "jm" -> 20000, "jd" -> 200, "jt" -> 10)
    roots.foreach { case (n, rows) =>
      val root = s"$dir/$n"
      DataSkipping.commitWithStats(spark, root,
        spark.range(rows).select(col("id").as("k"),
          concat(lit(s"$n-pad-pad-"), col("id")).as(s"${n}v"),
          lit("A").as("p")), "p", Seq("k"))
      spark.conf.set(s"spark.graft.table.$n", root)
    }
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    // written worst-first: the two big tables join before the dims
    val sql = """SELECT f.k, m.jmv, d.jdv, t.jtv FROM graft.jf f
                |JOIN graft.jm m ON f.k = m.k
                |JOIN graft.jd d ON f.k = d.k
                |JOIN graft.jt t ON f.k = t.k""".stripMargin
    try {
      val q = spark.sql(sql)
      val plan = q.queryExecution.optimizedPlan.toString
      val (fi, mi, di, ti) = (plan.indexOf("graft.jf"), plan.indexOf("graft.jm"),
        plan.indexOf("graft.jd"), plan.indexOf("graft.jt"))
      assert(Seq(fi, mi, di, ti).forall(_ >= 0), plan.take(3000))
      // selective-first left-deep: tiny joins before dim joins before mid
      assert(ti < di && di < mi,
        s"greedy order must be t < d < m:\n${plan.take(3000)}")
      assert(q.count() === 10L)
      // a user-hinted join is an opaque leaf: never reassociated (jm
      // stays joined where written, even though the dims around it may
      // still reorder)
      val hinted = spark.sql(sql.replace("SELECT",
        "SELECT /*+ MERGE(m) */")).queryExecution.optimizedPlan.toString
      assert(hinted.indexOf("graft.jm") < hinted.indexOf("graft.jd"),
        s"the hinted join must stay put:\n${hinted.take(3000)}")
      // estimate honesty: bare sides exact, a filtered side within 2×
      import org.apache.spark.sql.catalyst.expressions.{GreaterThanOrEqual, LessThan, Literal}
      import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
      val rel = spark.table("graft.jf").queryExecution.analyzed
        .collectFirst { case r: DataSourceV2Relation => r }.get
      assert(graft.plans.JoinOrderRule.leafRows(rel)._1 === 100000.0)
      val k = rel.output.find(_.name == "k").get
      val filtered = org.apache.spark.sql.catalyst.plans.logical.Filter(
        org.apache.spark.sql.catalyst.expressions.And(
          GreaterThanOrEqual(k, Literal(0L)), LessThan(k, Literal(100L))),
        rel)
      val (est, graftPriced) = graft.plans.JoinOrderRule.leafRows(filtered)
      assert(graftPriced, "a filtered graft side must price from the sidecars")
      assert(est >= 50.0 && est <= 200.0,
        s"estimate $est must be within 2x of the actual 100 rows")
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      roots.keys.foreach(n => spark.conf.unset(s"spark.graft.table.$n"))
    }
  }

  test("n-way reorder prices non-graft sides in the same row currency (mixed chain)") {
    val dir = Files.createTempDirectory("graft_ts_mixed")
    DataSkipping.commitWithStats(spark, s"$dir/F",
      spark.range(50000).select(col("id").as("k"),
        concat(lit("f-pad-"), col("id")).as("fv"), lit("A").as("p")),
      "p", Seq("k"))
    DataSkipping.commitWithStats(spark, s"$dir/M",
      spark.range(10000).select(col("id").as("k"),
        concat(lit("m-pad-pad-"), col("id")).as("mv"), lit("A").as("p")),
      "p", Seq("k"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.mxf", s"$dir/F")
    spark.conf.set("spark.graft.table.mxm", s"$dir/M")
    // the 10-row dim is a LOCAL relation: priced from plan.stats,
    // width-normalized into the same rows unit as the graft sides
    import spark.implicits._
    (0L until 10L).map(i => (i * 100, s"t$i")).toDF("tk", "tv")
      .createOrReplaceTempView("mxt")
    try {
      val plan = spark.sql(
        """SELECT f.k, m.mv, t.tv FROM graft.mxf f
          |JOIN graft.mxm m ON f.k = m.k
          |JOIN mxt t ON f.k = t.tk""".stripMargin)
        .queryExecution.optimizedPlan.toString
      val (ti, mi) = (plan.indexOf("LocalRelation"), plan.indexOf("graft.mxm"))
      assert(ti >= 0 && mi >= 0, plan.take(3000))
      assert(ti < mi,
        s"the 10-row local dim must join before the graft mid table:\n" +
          plan.take(3000))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.mxf")
      spark.conf.unset("spark.graft.table.mxm")
      spark.catalog.dropTempView("mxt")
    }
  }

  test("histogram selectivity: a skewed range prices within 2× where uniform is >5× off; ANALYZE incremental") {
    val root = Files.createTempDirectory("graft_ts_hist").toString
    // 90% zeros, 10% pseudo-uniform over [0, 100000): a range probe of
    // the upper half matches ~500 rows, but min/max interpolation sees
    // half the span and prices ~5000
    val data = (0 until 10000).map { i =>
      (if (i % 10 == 0) (i.toLong * 37) % 100000 else 0L, "A")
    }
    val actual = data.count(r => r._1 >= 50000 && r._1 <= 100000)
    assert(actual > 100, s"premise: skew fixture, actual=$actual")
    DataSkipping.commitWithStats(spark, root, data.toDF("v", "p"), "p",
      Seq("v"))
    val rel = new graft.sources.GraftRelation(spark, root,
      new graft.sources.PosixManifestStore(root), None)
    val gt = new graft.sources.GraftTable("hsk", rel)
    val fs = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("v", 50000L),
      org.apache.spark.sql.sources.LessThanOrEqual("v", 100000L))
    val est0 = gt.prunedRows(fs).get
    assert(est0 > actual * 5L,
      s"premise: uniform interpolation must be >5x off (est0=$est0, actual=$actual)")
    // heavy-hitter equality: v=0 holds ~90% of the rows, but NDV-uniform
    // pricing sees 1/ndv of them
    val eqFs = Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.EqualTo("v", 0L))
    val heavyActual = data.count(_._1 == 0L)
    val eq0 = gt.prunedRows(eqFs).get
    assert(eq0 < heavyActual / 5L,
      s"premise: uniform equality must be >5x off (eq0=$eq0, actual=$heavyActual)")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.hsk", root)
    try {
      spark.sql("ANALYZE TABLE graft.hsk COMPUTE STATISTICS FOR COLUMNS v")
      val est1 = gt.prunedRows(fs).get
      assert(est1 <= actual * 2L && est1 >= actual / 2L,
        s"histogram estimate $est1 must land within 2x of $actual")
      val eq1 = gt.prunedRows(eqFs).get
      assert(eq1 >= heavyActual / 2L && eq1 <= heavyActual * 2L,
        s"heavy-hitter equality must price at its mass: $eq1 vs $heavyActual")
      // incremental: evidence is complete now — a re-run burns no version
      val v1 = AtomicCommit.currentVersion(root).get
      spark.sql("ANALYZE TABLE graft.hsk COMPUTE STATISTICS FOR COLUMNS v")
      assert(AtomicCommit.currentVersion(root).get === v1,
        "re-ANALYZE with complete evidence must not commit")
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.hsk")
    }
  }

  test("ANALYZE converges on Infinity histograms; estimates degrade to uniform, never crash") {
    val root = Files.createTempDirectory("graft_ts_inf").toString
    // a double column holding Infinity: its histogram boundary defeats
    // decimal parsing — the record must still be WRITTEN (else every
    // future ANALYZE re-runs the scan job forever) and consumers must
    // fall back rather than price from it
    val data = (0 until 1000).map(i =>
      (if (i % 100 == 0) Double.PositiveInfinity else i.toDouble, "A"))
    import spark.implicits._
    DataSkipping.commitWithStats(spark, root, data.toDF("d", "p"), "p",
      Seq("d"))
    val m = AtomicCommit.readManifest(root).get
    assert(DataSkipping.analyze(spark, root, m, Seq("d")) === 1,
      "first ANALYZE retrofits the histogram")
    assert(DataSkipping.analyze(spark, root, m, Seq("d")) === 0,
      "the unparseable-boundary record still counts as evidence")
    val gen = AtomicCommit.ownersOf(m.entries("A")).head
    assert(DataSkipping.readHists(root, gen).exists(_.col == "d"),
      "the histogram record must exist, raw boundaries included")
    // pricing survives: range estimate comes from the uniform fallback
    val rel = new graft.sources.GraftRelation(spark, root,
      new graft.sources.PosixManifestStore(root), None)
    val gt = new graft.sources.GraftTable("inf", rel)
    val est = gt.prunedRows(Array[org.apache.spark.sql.sources.Filter](
      org.apache.spark.sql.sources.GreaterThanOrEqual("d", 0.0),
      org.apache.spark.sql.sources.LessThanOrEqual("d", 100.0)))
    assert(est.exists(e => e >= 1L && e <= 1000L), s"sane fallback: $est")
  }

  test("column pruning scales the DSv2 price: narrow projection < full width") {
    val root = Files.createTempDirectory("graft_ts5").toString
    DataSkipping.commitWithStats(spark, root,
      spark.range(5000).select(col("id").as("k"),
        concat(lit("wide-wide-wide-"), col("id")).as("s"),
        (col("id") % 7).as("v"), lit("A").as("p")),
      "p", Seq("k"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.w", root)
    try {
      def bytes(sql: String): Long =
        spark.sql(sql).queryExecution.optimizedPlan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan match {
              case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
                w.v1Scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
                  .estimateStatistics().sizeInBytes.getAsLong
            }
        }.head
      assert(bytes("SELECT k FROM graft.w") < bytes("SELECT * FROM graft.w"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.w")
    }
  }
}
