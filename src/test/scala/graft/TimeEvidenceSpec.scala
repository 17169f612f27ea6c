package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Compaction, DataSkipping, Deletes, GraftBatchScan, HiddenPartitioning}

/** Event-time evidence (r18): timestamp and date columns in the stats
  * sidecars, recorded in timezone-free epoch units ("tsn" micros, "dtn"
  * days) and compared numerically everywhere numeric kinds are — so the
  * operations a 100 TB event corpus lives on work on its TIME column:
  * retention reads/deletes prune partitions and files, recluster
  * provenance on `ts` verifies (sorted-days layouts join and window
  * sort-free), and `min(ts)/max(ts)` answer from metadata.
  */
class TimeEvidenceSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  private val SpjConfs = Seq(
    GraftBatchScan.EnabledConf -> "true",
    "spark.sql.sources.v2.bucketing.enabled" -> "true",
    "spark.sql.sources.v2.bucketing.pushPartValues.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> "-1")

  test("timestamp and date stats prune reads; retention deleteRange touches only intersecting partitions") {
    val root = Files.createTempDirectory("graft_time_ev").toString
    // four partitions, each holding one disjoint day
    val rows = (0 until 400).map { i =>
      val d = i / 100 + 1
      (i.toLong, ts(f"2024-05-0$d ${i % 24}%02d:00:00"),
        java.sql.Date.valueOf(f"2024-05-0$d"), s"P$d")
    }
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("k", "ts", "dt", "p"), "p", Seq("ts", "dt"))

    // a day's range read prunes to ITS partition only (inclusive bounds)
    val day2 = DataSkipping.readWhere(spark, root, "ts",
      ts("2024-05-02 00:00:00"), ts("2024-05-02 23:59:59"))
    assert(day2.count() === 100)
    assert(day2.inputFiles.nonEmpty &&
      day2.inputFiles.forall(_.contains("p=P2")),
      s"timestamp stats must prune to the matching partition: " +
        s"${day2.inputFiles.take(3).mkString(", ")}")
    // boundary exactness: the day's extremes are included, neighbors not
    val edge = DataSkipping.readWhere(spark, root, "ts",
      ts("2024-05-02 23:00:00"), ts("2024-05-03 00:00:00"))
    // hours repeat 4x per 100-row day: 4 rows at 05-02 23:00 and 4 at
    // 05-03 00:00, inclusive on both ends
    assert(edge.count() === 8, "boundary rows on both ends, nothing else")

    // the DATE column prunes the same way in days
    val dDay = DataSkipping.readWhere(spark, root, "dt",
      java.sql.Date.valueOf("2024-05-03"), java.sql.Date.valueOf("2024-05-03"))
    assert(dDay.count() === 100)
    assert(dDay.inputFiles.forall(_.contains("p=P3")))

    // retention delete: provably-disjoint partitions are never scanned,
    // the emptied day folds out of the manifest
    val v = Deletes.deleteRange(spark, root, "ts",
      ts("2024-05-01 00:00:00"), ts("2024-05-01 23:59:59"), Seq("ts"))
    assert(v.nonEmpty)
    assert(AtomicCommit.read(spark, root).count() === 300)
    assert(!AtomicCommit.readManifest(root).get.entries.contains("P1"),
      "the emptied retention day must fold out")

    // metadata min/max(ts)/count answer SCAN-FREE: physically delete the
    // data files, the sidecar-served answers survive (the blunt proof)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.time_ev", root)
    try {
      val expectMin = ts("2024-05-02 00:00:00")
      val expectMax = ts("2024-05-04 23:00:00")
      val live = spark.sql(
        "SELECT min(ts), max(ts), count(*) FROM graft.time_ev").head()
      assert(live.getTimestamp(0) === expectMin &&
        live.getTimestamp(1) === expectMax && live.getLong(2) === 300L)
      // one partition's files stay for the schema footer probe; the
      // max day (P4) is among the DELETED ones, so only the sidecars
      // can answer it
      import scala.jdk.CollectionConverters._
      java.nio.file.Files.walk(java.nio.file.Paths.get(root)).iterator()
        .asScala.filter(f => f.toString.endsWith(".parquet") &&
          !f.toString.contains("p=P2"))
        .foreach(java.nio.file.Files.delete)
      val meta = spark.sql(
        "SELECT min(ts), max(ts), min(dt), count(*) FROM graft.time_ev").head()
      assert(meta.getTimestamp(0) === expectMin &&
        meta.getTimestamp(1) === expectMax &&
        meta.getDate(2) === java.sql.Date.valueOf("2024-05-02") &&
        meta.getLong(3) === 300L,
        "time min/max must answer from the sidecars alone")
    } finally {
      spark.conf.unset("spark.graft.table.time_ev")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("file-granular timestamp skipping after a recluster on ts") {
    val root = Files.createTempDirectory("graft_time_files").toString
    // ONE partition spanning 8 days, ingested unordered
    val rows = (0 until 800).map { i =>
      val shuffled = (i * 377) % 800 // deterministic scramble
      (shuffled.toLong,
        ts(f"2024-06-0${shuffled / 100 + 1} ${shuffled % 24}%02d:00:00"), "A")
    }
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("k", "ts", "p"), "p", Seq("ts"))
    val before = DataSkipping.readWhere(spark, root, "ts",
      ts("2024-06-03 00:00:00"), ts("2024-06-03 23:59:59"))
    val expect = before.collect().map(_.getLong(0)).toSet
    assert(expect.size === 100)

    // recluster sorts the partition by ts into 8 files each owning a
    // narrow time range: the same probe now reads ~1 of 8 files
    Compaction.recluster(spark, root, Seq("ts"), filesPerDir = 8)
    val after = DataSkipping.readWhere(spark, root, "ts",
      ts("2024-06-03 00:00:00"), ts("2024-06-03 23:59:59"))
    assert(after.collect().map(_.getLong(0)).toSet === expect)
    assert(after.inputFiles.length < 8,
      s"file-granular ts evidence must skip files: " +
        s"${after.inputFiles.length} of ${Compaction.countDataFiles(root)}")
  }

  test("timestamp bound folding is exact at full precision (sub-millisecond envelopes)") {
    // valueBounds drives envelope pruning for large runtime key sets: a
    // millis-truncating compare would tie these and could pick an
    // envelope that excludes a matching partition (silent row loss)
    val t1 = ts("2024-05-01 00:00:00"); t1.setNanos(100000) // .000100
    val t2 = ts("2024-05-01 00:00:00"); t2.setNanos(900000) // .000900
    val t3 = ts("2024-05-01 00:00:01")
    val (lo, hi) = graft.sources.DataSkipping.valueBounds(Seq(t2, t3, t1)).get
    assert(lo === t1, s"true min is the sub-ms-earlier value: $lo")
    assert(hi === t3)
  }

  test("a time-range predicate prices its true selectivity (retention windows broadcast their slice)") {
    val root = Files.createTempDirectory("graft_time_sel").toString
    // 1000 rows uniform over 10 days, partitions NOT time-correlated —
    // partition pruning removes nothing, so the estimate below must
    // come from the envelope interpolation in epoch units
    DataSkipping.commitWithStats(spark, root,
      (0 until 1000).map { i =>
        (i.toLong, ts(f"2024-08-${i % 10 + 1}%02d ${i % 24}%02d:00:00"),
          s"P${i % 4}")
      }.toDF("k", "ts", "p"), "p", Seq("ts"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.tsel", root)
    try {
      def scanRows(sql: String): Long = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        val scans = plan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan
        }
        assert(scans.nonEmpty, s"no v2 scan in:\n$plan")
        (scans.head match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
          case s =>
            s.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
        }).numRows.getAsLong
      }
      // a ~1-day window of a 10-day table: actual 100 of 1000 — the
      // epoch-unit interpolation must price it near that, not at the
      // whole table (which is what an unparseable time probe left)
      val window = scanRows(
        "SELECT * FROM graft.tsel WHERE ts >= timestamp'2024-08-03 00:00:00' " +
          "AND ts <= timestamp'2024-08-03 23:59:59'")
      assert(window >= 30L && window <= 300L,
        s"1-of-10-days window priced at $window rows (actual 100)")
      val all = scanRows("SELECT * FROM graft.tsel")
      assert(all === 1000L)
    } finally {
      spark.conf.unset("spark.graft.table.tsel")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("ANALYZE histograms on ts: a skewed burst day prices its true mass, not 1/Nth of the range") {
    val root = Files.createTempDirectory("graft_time_hist").toString
    // 900 of 1000 rows on day 1 (the burst), 100 spread over days 2-10;
    // partitions not time-correlated so the estimate is all selectivity
    DataSkipping.commitWithStats(spark, root,
      (0 until 1000).map { i =>
        val t =
          if (i < 900) ts(f"2024-09-01 ${i % 24}%02d:00:00")
          else ts(f"2024-09-${i % 9 + 2}%02d 00:00:00")
        (i.toLong, t, s"P${i % 4}")
      }.toDF("k", "ts", "p"), "p", Seq("ts"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.thist", root)
    try {
      def scanRows(sql: String): Long = {
        val plan = spark.sql(sql).queryExecution.optimizedPlan
        val scans = plan.collect {
          case r: org.apache.spark.sql.execution.datasources.v2.DataSourceV2ScanRelation =>
            r.scan
        }
        (scans.head match {
          case w: org.apache.spark.sql.execution.datasources.v2.V1ScanWrapper =>
            w.v1Scan.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
          case s =>
            s.asInstanceOf[org.apache.spark.sql.connector.read.SupportsReportStatistics]
              .estimateStatistics()
        }).numRows.getAsLong
      }
      val q = "SELECT * FROM graft.thist WHERE " +
        "ts >= timestamp'2024-09-01 00:00:00' AND " +
        "ts <= timestamp'2024-09-01 23:59:59'"
      // envelope-only: uniform interpolation under-prices the burst
      val uniform = scanRows(q)
      assert(uniform < 450L,
        s"uniform interpolation should under-price the burst day: $uniform")
      // ANALYZE writes the epoch-unit equi-depth histogram; the same
      // window now prices near its true 900 rows
      spark.sql("ANALYZE TABLE graft.thist COMPUTE STATISTICS FOR COLUMNS ts")
        .collect()
      val hist = scanRows(q)
      assert(hist >= 450L && hist <= 1000L,
        s"histogram must price the burst day near 900 rows, got $hist")
    } finally {
      spark.conf.unset("spark.graft.table.thist")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("sorted-days: reclustered co-days tables join on ts with zero shuffles AND zero sorts") {
    val rootA = Files.createTempDirectory("graft_time_sda").toString
    val rootB = Files.createTempDirectory("graft_time_sdb").toString
    val spec = HiddenPartitioning.Days("ts")
    def mk(n: Int, step: Int) = (0 until n by step).map { i =>
      (i.toLong, ts(f"2024-07-0${i % 4 + 1} ${i % 24}%02d:${i % 60}%02d:00"))
    }
    HiddenPartitioning.commitReplace(spark, rootA,
      mk(400, 1).toDF("k", "ts"), spec)
    HiddenPartitioning.commitAppend(spark, rootA,
      mk(400, 1).map { case (k, t) => (k + 1000L, t) }.toDF("k", "ts"), spec)
    HiddenPartitioning.commitReplace(spark, rootB,
      mk(400, 4).map { case (k, t) => (t, s"n$k") }.toDF("ts", "name"), spec)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.sda", rootA)
    spark.conf.set("spark.graft.table.sdb", rootB)
    try {
      val join =
        """SELECT a.k, b.name FROM graft.sda a
          |JOIN graft.sdb b ON a.ts = b.ts""".stripMargin
      def rowsOf(q: String): Seq[String] =
        spark.sql(q).collect().map(_.toString).sorted.toSeq
      val off = withSQLConf(
        "spark.sql.autoBroadcastJoinThreshold" -> "-1")(rowsOf(join))
      assert(off.nonEmpty)

      // recluster both sides on ts — event-time sidecars make the
      // provenance VERIFIABLE, so the days faces claim [ts ASC]
      Compaction.recluster(spark, rootA, Seq("ts"), filesPerDir = 2)
      Compaction.recluster(spark, rootB, Seq("ts"), filesPerDir = 2)
      val (on, plan) = withSQLConf(SpjConfs: _*) {
        val d = spark.sql(join)
        val r = d.collect().map(_.toString).sorted.toSeq
        (r, d.queryExecution.executedPlan.toString)
      }
      assert(on === off, "sorted-days join changed the answer")
      assert(!plan.contains("Exchange hashpartitioning"),
        s"co-days ts join must not shuffle\n${plan.take(1500)}")
      assert(!plan.contains("Sort ["),
        s"recluster's [ts ASC] provenance must serve the merge join " +
          s"sort-free\n${plan.take(1500)}")
    } finally {
      spark.conf.unset("spark.graft.table.sda")
      spark.conf.unset("spark.graft.table.sdb")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }
}
