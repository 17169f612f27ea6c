package graft

import java.nio.file.Files

import org.apache.spark.sql.sources.{BaseRelation, EqualTo, Filter, In, TableScan}

import graft.sources.{AtomicCommit, DataSkipping, GraftRelation, GraftScanProbe, GraftV1Scan, PosixManifestStore}

/** RUNTIME FILTERING ([[graft.sources.GraftV1Scan]] +
  * [[graft.plans.RuntimeFilterRule]]) — the dynamic-partition-pruning
  * analog: a broadcast join's built key set reaches the graft scan
  * through the standard `SupportsRuntimeFiltering.filter` face and
  * prunes manifest entries before a byte is read. Unit half drives the
  * DSv2 interface directly; the end-to-end half proves the EXECUTED
  * plan of a `dim JOIN graft.fact` query scanned strictly fewer
  * partitions than the unfiltered read, via [[GraftScanProbe]].
  */
class RuntimeFilteringSpec extends SparkSpec {
  import spark.implicits._

  private def rowsOf(scan: GraftV1Scan): Long =
    scan.toV1TableScan[BaseRelation with TableScan](spark.sqlContext)
      .buildScan().count()

  private def register(name: String, root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.graft.table.$name", root)
  }
  private def unregister(name: String): Unit = {
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.unset(s"spark.graft.table.$name")
  }

  test("scan interface: IN on the partition column re-prunes entries and statistics") {
    val root = Files.createTempDirectory("graft_rtf_p").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 400L).map(i => (i, s"P${(i % 4).toInt}")).toDF("k", "p"), "p")
    val rel = new GraftRelation(spark, root, new PosixManifestStore(root), None)
    val scan = new GraftV1Scan(rel, rel.schema, Array.empty)
    // the partition column is always runtime-filterable
    assert(scan.filterAttributes().map(_.fieldNames().head).contains("p"))
    val fullBytes = scan.estimateStatistics().sizeInBytes().getAsLong
    val fullRows = rowsOf(scan)
    assert(fullRows === 400L)
    scan.filter(Array[Filter](In("p", Array("P1", "P3"))))
    val prunedBytes = scan.estimateStatistics().sizeInBytes().getAsLong
    assert(prunedBytes < fullBytes,
      s"pruned $prunedBytes must be < full $fullBytes")
    assert(rowsOf(scan) === 200L)
    // runtime filters COMPOSE with (they never replace) the pushed set
    val scan2 = new GraftV1Scan(rel, rel.schema,
      Array[Filter](EqualTo("p", "P1")))
    scan2.filter(Array[Filter](In("p", Array("P1", "P3"))))
    assert(rowsOf(scan2) === 100L)
  }

  test("scan interface: IN on a stats column prunes via min/max; blooms refute scattered keys") {
    val root = Files.createTempDirectory("graft_rtf_s").toString
    // disjoint k ranges per partition → min/max envelopes decide IN
    val rows = (0L until 300L).map(i => (i / 100 * 1000 + i % 100,
      s"P${(i / 100).toInt}"))
    DataSkipping.commitWithStats(spark, root, rows.toDF("k", "p"), "p",
      Seq("k"))
    val rel = new GraftRelation(spark, root, new PosixManifestStore(root), None)
    val scan = new GraftV1Scan(rel, rel.schema, Array.empty)
    assert(scan.filterAttributes().map(_.fieldNames().head).toSet
      === Set("p", "k"))
    scan.filter(Array[Filter](In("k", Array(5L, 1050L))))
    assert(rowsOf(scan) === 200L,
      "only P0 and P1 admit the two keys")
    // a column with NO evidence is not filterable: filter() drops it
    val scan2 = new GraftV1Scan(rel, rel.schema, Array.empty)
    scan2.filter(Array[Filter](In("zz", Array(1L))))
    assert(scan2.runtime.isEmpty)

    // interleaved keys: every partition spans the full range, min/max
    // admit everything — the BLOOM refutes per partition
    val broot = Files.createTempDirectory("graft_rtf_b").toString
    val brows = (0L until 300L).map(i => (i, s"P${(i % 3).toInt}"))
    val staged = AtomicCommit.stage(spark, broot, brows.toDF("k", "p"), "p")
    DataSkipping.annotateStagedBloom(spark, broot, staged, Seq("k"))
    AtomicCommit.publish(broot, staged)
    val brel = new GraftRelation(spark, broot,
      new PosixManifestStore(broot), None)
    val bscan = new GraftV1Scan(brel, brel.schema, Array.empty)
    // k=0 and k=3 both live in P0 only (k % 3 == 0)
    bscan.filter(Array[Filter](In("k", Array(0L, 3L))))
    assert(rowsOf(bscan) === 100L,
      "blooms must reduce the scan to P0")
  }

  test("end-to-end: a broadcast dim join scans strictly fewer partitions at execution") {
    val root = Files.createTempDirectory("graft_rtf_e2e").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 2000L).map(i => (i, s"name_$i", s"P${(i % 4).toInt}"))
        .toDF("k", "nm", "p"), "p")
    register("rtfact", root)
    Seq(("P1", 1), ("ZZ", 2)).toDF("p2", "m").createOrReplaceTempView("rtdim")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      // dim (a 2-row local relation) broadcasts; the 4-partition fact
      // parquet does not
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      GraftScanProbe.reset(root)
      val df = spark.sql(
        """SELECT f.k, f.nm FROM graft.rtfact f
          |JOIN rtdim d ON f.p = d.p2 WHERE d.m = 1""".stripMargin)
      val got = df.collect()
      // correctness first: exactly partition P1's rows
      assert(got.length === 500)
      assert(got.map(_.getLong(0)).forall(_ % 4 == 1))
      // the EXECUTED read pruned: the initial plan builds the scan over
      // all 4 entries, the AQE replan (runtime filter delivered) over 1
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty, "scan probe saw no builds")
      assert(seen.last === 1,
        s"final scan must read 1 of 4 partitions, saw $seen")
      assert(seen.head === 4, s"initial plan reads all partitions: $seen")
    } finally {
      unregister("rtfact")
      spark.catalog.dropTempView("rtdim")
    }
  }

  test("file-granular pruning: pushed ranges and runtime keys read FILES, not directories") {
    val root = Files.createTempDirectory("graft_rtf_files").toString
    // every partition spans the full v range (no partition prunes), then
    // recluster sorts by v into 6 files/dir: per-file min/max envelopes
    // become disjoint v slabs
    val rows = (0L until 3000L).map(i => (i * 7L, s"P${(i % 3).toInt}"))
    DataSkipping.commitWithStats(spark, root, rows.toDF("v", "p"), "p",
      Seq("v"))
    graft.sources.Compaction.recluster(spark, root, Seq("v"),
      filesPerDir = 6)
    val totalFiles = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try s.filter(f => f.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(f)).count()
      finally s.close()
    }
    assert(totalFiles >= 18, s"premise: multi-file dirs, got $totalFiles")
    register("rtfiles", root)
    try {
      // STATIC closed range covering ~1/6 of the value space: the scan
      // lists individual files, far fewer than the table holds
      GraftScanProbe.reset(root)
      val got = spark.sql(
        "SELECT v FROM graft.rtfiles WHERE v BETWEEN 0 AND 3000").collect()
      assert(got.length === 429)
      val ranged = GraftScanProbe.filesSeen(root)
      assert(ranged.nonEmpty, "range scan must take the file-pruned path")
      assert(ranged.last <= totalFiles / 2,
        s"range must prune files: read ${ranged.last} of $totalFiles")
      // RUNTIME join keys prune to files too: 2 keys → ≤ 2 files/partition
      Seq((700L, 1), (14000L, 1)).toDF("v2", "m")
        .createOrReplaceTempView("rtdimf")
      withSQLConf(
        "spark.sql.adaptive.enabled" -> "true",
        "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
        GraftScanProbe.reset(root)
        val j = spark.sql(
          """SELECT f.v FROM graft.rtfiles f
            |JOIN rtdimf d ON f.v = d.v2""".stripMargin).collect()
        assert(j.map(_.getLong(0)).sorted.toSeq === Seq(700L, 14000L))
        val seen = GraftScanProbe.filesSeen(root)
        assert(seen.nonEmpty, "runtime-filtered scan must prune files")
        assert(seen.last <= 6,
          s"2 keys must read ≤2 files per partition, read ${seen.last} " +
            s"of $totalFiles")
      }
    } finally {
      unregister("rtfiles")
      spark.catalog.dropTempView("rtdimf")
    }
  }

  test("multi-key joins filter per column (packed-long relation included)") {
    val root = Files.createTempDirectory("graft_rtf_multi").toString
    // disjoint a-ranges per partition; two int keys pack into Spark's
    // LongHashedRelation, the trickiest key layout to address by index
    val rows = (0 until 300).map(i =>
      (i / 100 * 1000 + i % 100, i % 10, i.toString * 16, s"P${i / 100}"))
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("a", "b", "pad", "p"), "p", Seq("a", "b"))
    register("rtmulti", root)
    Seq((1050, 0, "x")).toDF("a2", "b2", "tag")
      .createOrReplaceTempView("rtdim2")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      GraftScanProbe.reset(root)
      // hint the DIM as build side: the width-pruned two-int fact is
      // small enough that Spark would otherwise broadcast IT (correct,
      // but then no probe-side graft scan exists to filter)
      val got = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.a, f.b FROM graft.rtmulti f
          |JOIN rtdim2 d ON f.a = d.a2 AND f.b = d.b2""".stripMargin)
        .collect()
      assert(got.toSeq.map(r => (r.getInt(0), r.getInt(1))) === Seq((1050, 0)))
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"the a-key's IN must prune to P1, saw $seen")
    } finally {
      unregister("rtmulti")
      spark.catalog.dropTempView("rtdim2")
    }
  }

  test("a single int join key (rewriteKeyExpr's upcast-to-long mode) still filters") {
    val root = Files.createTempDirectory("graft_rtf_int").toString
    // disjoint int-key ranges per partition; the lone IntegerType join
    // key is upcast to ONE LongType mode key by rewriteKeyExpr — the
    // most common dim-join shape, and a layout the bridge must unpack
    // through extractKeyExprAt's single-key Cast
    val rows = (0 until 300).map(i =>
      (i / 100 * 1000 + i % 100, i.toString * 16, s"P${i / 100}"))
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("a", "pad", "p"), "p", Seq("a"))
    register("rtint", root)
    Seq((1050, "x")).toDF("a2", "tag").createOrReplaceTempView("rtdimint")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.a FROM graft.rtint f
          |JOIN rtdimint d ON f.a = d.a2""".stripMargin).collect()
      assert(got.map(_.getInt(0)).toSeq === Seq(1050))
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"the single-int key must prune to P1, saw $seen")
    } finally {
      unregister("rtint")
      spark.catalog.dropTempView("rtdimint")
    }
  }

  test("over-budget keys on an interleaved layout: the FULL set still lands and blooms prune") {
    val root = Files.createTempDirectory("graft_rtf_evd").toString
    // interleaved keys (k % 3 names the partition): every partition
    // spans the full [0, 2999] range, so the over-budget [min, max]
    // fallback would prune NOTHING — only per-key bloom probes can.
    // 12 keys > maxKeys 4 but within bloomMaxKeys: the KeyEvidence
    // path delivers the whole set and the blooms refute P1/P2
    val rows = (0L until 3000L).map(i => (i, i.toString * 16,
      s"P${(i % 3).toInt}"))
    val staged = AtomicCommit.stage(spark, root, rows.toDF("k", "pad", "p"), "p")
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, staged)
    register("rtevd", root)
    (0L until 12L).map(i => (i * 3L, 1)).toDF("k2", "m")
      .createOrReplaceTempView("rtdimevd")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.graft.runtimeFilter.maxKeys" -> "4") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.k FROM graft.rtevd f
          |JOIN rtdimevd d ON f.k = d.k2""".stripMargin).collect()
      assert(got.map(_.getLong(0)).sorted.toSeq === (0L until 12L).map(_ * 3L))
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"12 keys ≡ 0 (mod 3) live only in P0; blooms must prune to it, saw $seen")
      assert(seen.head === 3, s"initial plan reads all partitions: $seen")
    } finally {
      unregister("rtevd")
      spark.catalog.dropTempView("rtdimevd")
    }
  }

  test("file-grain blooms prune a large runtime key set to the files that hold it") {
    val root = Files.createTempDirectory("graft_rtf_fblooms").toString
    // one partition, 4 unsorted files: per-file blooms are the only
    // evidence that can tell the files apart (no value ordering)
    val rows = (0L until 4000L).map(i => (i, s"P0"))
    val staged = AtomicCommit.stage(spark, root, rows.toDF("k", "p"), "p",
      filesPerDir = 4)
    // 2^20 bits keeps the per-file false-positive odds negligible for a
    // 1000-key probe set (the default 2^16 would flake at ~9% per file)
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"),
      numBits = 1 << 20)
    AtomicCommit.publish(root, staged)
    val parquetFiles = {
      import scala.jdk.CollectionConverters._
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root))
      try s.iterator().asScala.filter(f => f.toString.endsWith(".parquet") &&
        java.nio.file.Files.isRegularFile(f)).map(_.toString).toSeq
      finally s.close()
    }
    // the salt hashes (partition, salt) into the shuffle-partition space,
    // so salts can collide into fewer writing tasks — multi-file is the
    // premise, the exact count isn't
    assert(parquetFiles.length >= 2, s"premise: multi-file, got $parquetFiles")
    // probe with the keys of ONE physical file — far more than any
    // exact-IN budget, well within the scan's caps
    val probeKeys = spark.read.parquet(parquetFiles.head)
      .select("k").as[Long].collect().toSeq
    assert(probeKeys.nonEmpty)
    val rel = new GraftRelation(spark, root, new PosixManifestStore(root), None)
    val scan = new GraftV1Scan(rel, rel.schema, Array.empty)
    GraftScanProbe.reset(root)
    scan.filter(Array[Filter](In("k", probeKeys.map(_.asInstanceOf[Any]).toArray)))
    assert(rowsOf(scan) === probeKeys.length.toLong)
    val files = GraftScanProbe.filesSeen(root)
    assert(files.nonEmpty, "the scan must take the file-pruned path")
    assert(files.last === 1,
      s"${probeKeys.length} keys of one file must read exactly that file, saw $files")
  }

  test("a DATE join key filters through bloom evidence (no stats kind exists for dates)") {
    val root = Files.createTempDirectory("graft_rtf_date").toString
    // dates interleave across partitions (day % 3): only blooms can
    // prune, and the probe must hash java.sql.Date exactly as the
    // sidecar writer's job did
    val rows = (0 until 300).map { i =>
      (java.sql.Date.valueOf(java.time.LocalDate.of(2026, 1, 1)
        .plusDays(i)), i.toString * 16, s"P${i % 3}")
    }
    import spark.implicits._
    val staged = AtomicCommit.stage(spark, root, rows.toDF("d", "pad", "p"), "p")
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("d"))
    AtomicCommit.publish(root, staged)
    register("rtdate", root)
    // 2 dates, both ≡ 0 (mod 3) days from the epoch start → both in P0
    Seq((java.sql.Date.valueOf("2026-01-01"), 1),
      (java.sql.Date.valueOf("2026-01-04"), 1)).toDF("d2", "m")
      .createOrReplaceTempView("rtdimdate")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.d FROM graft.rtdate f
          |JOIN rtdimdate d ON f.d = d.d2""".stripMargin).collect()
      assert(got.map(_.getDate(0).toString).sorted.toSeq
        === Seq("2026-01-01", "2026-01-04"))
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"both probe dates live in P0; blooms must prune to it, saw $seen")
    } finally {
      unregister("rtdate")
      spark.catalog.dropTempView("rtdimdate")
    }
  }

  test("over-budget key sets degrade to a [min,max] range, which still prunes") {
    val root = Files.createTempDirectory("graft_rtf_range").toString
    // disjoint k ranges per partition: 0-999 / 10000-10999 / 20000-20999;
    // padded so the FACT stays over the broadcast threshold (the dim
    // must be the build side for a runtime filter to exist)
    val rows = (0L until 3000L).map(i => (i / 1000 * 10000 + i % 1000,
      i.toString * 16, s"P${(i / 1000).toInt}"))
    DataSkipping.commitWithStats(spark, root, rows.toDF("k", "pad", "p"), "p",
      Seq("k"))
    register("rtrange", root)
    // 40 distinct keys (> budget 10), ALL inside P0's [0, 999] envelope
    (0L until 40L).map(i => (i, 1)).toDF("k2", "m")
      .createOrReplaceTempView("rtdimr")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "4096",
      "spark.graft.runtimeFilter.maxKeys" -> "10",
      // force past BOTH budgets: the pure [min, max] fallback
      "spark.graft.runtimeFilter.bloomMaxKeys" -> "20") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT f.k FROM graft.rtrange f
          |JOIN rtdimr d ON f.k = d.k2""".stripMargin).collect()
      assert(got.length === 40)
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"the [0,39] key range must prune to P0, saw $seen")
    } finally {
      unregister("rtrange")
      spark.catalog.dropTempView("rtdimr")
    }
  }

  // the join key here is the PARTITION column, whose entries prune only
  // by equality/IN — the over-budget [min,max] fallback has no string-
  // range mapping onto directory names, so the scan honestly reads all
  test("end-to-end: keys past BOTH budgets on the partition column fall back to the full scan") {
    val root = Files.createTempDirectory("graft_rtf_budget").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 400L).map(i => (i, s"P${(i % 4).toInt}")).toDF("k", "p"), "p")
    register("rtbudget", root)
    (0 until 40).map(i => (s"P${i % 4}x$i", 1)).toDF("p2", "m")
      .createOrReplaceTempView("rtdimwide")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "1048576",
      "spark.graft.runtimeFilter.maxKeys" -> "10",
      "spark.graft.runtimeFilter.bloomMaxKeys" -> "20") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT f.k FROM graft.rtbudget f
          |JOIN rtdimwide d ON f.p = d.p2""".stripMargin).collect()
      assert(got.isEmpty, "no dim key names a real partition")
      val seen = GraftScanProbe.entriesSeen(root)
      // 40 distinct keys > both budgets: every build reads all 4 entries
      assert(seen.nonEmpty && seen.forall(_ === 4),
        s"over-budget filter must not prune, saw $seen")
    } finally {
      unregister("rtbudget")
      spark.catalog.dropTempView("rtdimwide")
    }
  }

  test("keys over the exact budget but within bloomMaxKeys still prune the partition map") {
    val root = Files.createTempDirectory("graft_rtf_pmap").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0L until 400L).map(i => (i, s"P${(i % 4).toInt}")).toDF("k", "p"), "p")
    register("rtpmap", root)
    // P1 plus 39 fakes: 40 distinct keys > maxKeys 10, within the
    // extended budget — the full set lands and the manifest keeps only
    // the one real partition
    (("P1", 1) +: (0 until 39).map(i => (s"ZZ$i", 1))).toDF("p2", "m")
      .createOrReplaceTempView("rtdimpmap")
    try withSQLConf(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.autoBroadcastJoinThreshold" -> "1048576",
      "spark.graft.runtimeFilter.maxKeys" -> "10") {
      GraftScanProbe.reset(root)
      val got = spark.sql(
        """SELECT /*+ BROADCAST(d) */ f.k FROM graft.rtpmap f
          |JOIN rtdimpmap d ON f.p = d.p2""".stripMargin).collect()
      assert(got.length === 100)
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"the large set must still prune the partition map to P1, saw $seen")
    } finally {
      unregister("rtpmap")
      spark.catalog.dropTempView("rtdimpmap")
    }
  }
}
