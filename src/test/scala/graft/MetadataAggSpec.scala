package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes, GraftScanProbe}

/** METADATA-ANSWERED AGGREGATES ([[graft.sources.GraftTable]]'s
  * SupportsPushDownAggregates face): COUNT(*)/COUNT(col)/MIN/MAX —
  * optionally grouped by the partition column — answer from the
  * manifest and stats sidecars without reading a data file. Proven
  * scan-free the blunt way: the data files are physically DELETED and
  * the answers survive. Everything the evidence cannot answer exactly
  * (residual filters, delete evidence, DISTINCT/SUM shapes) falls back
  * to the ordinary scan, asserted for correctness.
  */
class MetadataAggSpec extends SparkSpec {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.graft.table.$name", root)
  }
  private def unregister(name: String): Unit = {
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.unset(s"spark.graft.table.$name")
  }

  test("count/min/max answer from sidecars — even after the data files are gone") {
    val root = Files.createTempDirectory("graft_magg").toString
    // k: disjoint ranges per partition; s: strings; n: has nulls
    val rows = (0L until 300L).map { i =>
      val k = i / 100 * 1000 + i % 100
      (k, s"s$k", if (i % 10 == 0) None else Some(i), s"P${(i / 100).toInt}")
    }
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("k", "s", "n", "p"), "p", Seq("k", "s", "n"))
    register("ma", root)
    try {
      def agg(sql: String) = spark.sql(sql).collect()
      GraftScanProbe.reset(root)
      // global shapes
      assert(agg("SELECT count(*) FROM graft.ma").head.getLong(0) === 300L)
      assert(agg("SELECT min(k), max(k) FROM graft.ma").head
        .let(r => (r.getLong(0), r.getLong(1))) === ((0L, 2099L)))
      assert(agg("SELECT count(n) FROM graft.ma").head.getLong(0) === 270L,
        "count(col) must subtract the recorded nulls")
      assert(agg("SELECT min(s), max(s) FROM graft.ma").head
        .let(r => (r.getString(0), r.getString(1))) === (("s0", "s99")))
      // the partition column itself: entry keys are the evidence
      assert(agg("SELECT min(p), max(p), count(p) FROM graft.ma").head
        .let(r => (r.getString(0), r.getString(1), r.getLong(2)))
        === (("P0", "P2", 300L)))
      // grouped by the partition column
      val grouped = agg(
        "SELECT p, count(*), min(k) FROM graft.ma GROUP BY p ORDER BY p")
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
      assert(grouped === Seq(("P0", 100L, 0L), ("P1", 100L, 1000L),
        ("P2", 100L, 2000L)))
      // NONE of the above built a data scan
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        s"metadata aggregates must not scan: ${GraftScanProbe.entriesSeen(root)}")
      // the blunt proof: remove every data file OUTSIDE one partition
      // (one footer stays for schema probing) — answers don't change
      val m = AtomicCommit.readManifest(root).get
      for ((pv, e) <- m.entries if pv != "P0"; g <- AtomicCommit.ownersOf(e)) {
        val dir = Paths.get(root, g, s"p=$pv")
        val s0 = Files.walk(dir)
        try s0.filter(f => Files.isRegularFile(f)).forEach(f => Files.delete(f))
        finally s0.close()
      }
      assert(agg("SELECT count(*) FROM graft.ma").head.getLong(0) === 300L)
      assert(agg("SELECT max(k) FROM graft.ma").head.getLong(0) === 2099L,
        "P2's data files are gone; only the sidecars can know this")
    } finally unregister("ma")
  }

  test("shapes the evidence cannot answer exactly fall back to the real scan") {
    val root = Files.createTempDirectory("graft_magg_fb").toString
    DataSkipping.commitWithStats(spark, root,
      (0L until 100L).map(i => (i, s"P${(i % 2).toInt}")).toDF("k", "p"),
      "p", Seq("k"))
    register("mfb", root)
    try {
      def one(sql: String): Long = spark.sql(sql).collect().head.getLong(0)
      // residual filter: pushAggregation never fires, the scan answers
      GraftScanProbe.reset(root)
      assert(one("SELECT count(*) FROM graft.mfb WHERE k >= 50") === 50L)
      assert(GraftScanProbe.entriesSeen(root).nonEmpty,
        "a filtered aggregate must run the real scan")
      // DISTINCT isn't in the evidence: real scan, right answer
      assert(one("SELECT count(DISTINCT k) FROM graft.mfb") === 100L)
      // SUM over an exact-summable column IS evidence now (r17) — same
      // answer either way; the dedicated SUM test proves it scan-free
      assert(one("SELECT sum(k) FROM graft.mfb") === (0L until 100L).sum)
      // delete evidence: physical counts overstate the logical table, so
      // the pushdown refuses and the scan (DV-merged) answers
      Deletes.deleteKeysMoR(spark, root, "k", Seq(7L, 8L))
      GraftScanProbe.reset(root)
      assert(one("SELECT count(*) FROM graft.mfb") === 98L)
      assert(GraftScanProbe.entriesSeen(root).nonEmpty,
        "delete evidence must force the real scan")
      // a rename strands the sidecar names: refuse, scan, right answer
      AtomicCommit.renameColumn(spark, root,
        new graft.sources.PosixManifestStore(root), "k", "key")
      assert(one("SELECT max(key) FROM graft.mfb") === 99L)
    } finally unregister("mfb")
  }

  test("LIMIT pushdown: a provable partition prefix is all the scan reads") {
    val root = Files.createTempDirectory("graft_limit").toString
    DataSkipping.commitWithStats(spark, root,
      (0L until 400L).map(i => (i, s"P${(i % 4).toInt}")).toDF("k", "p"),
      "p", Seq("k"))
    register("ml", root)
    try {
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT * FROM graft.ml LIMIT 10").collect()
        .length === 10)
      val seen = GraftScanProbe.entriesSeen(root)
      assert(seen.nonEmpty && seen.last === 1,
        s"LIMIT 10 must read 1 of 4 partitions, saw $seen")
      // a limit past one partition's rows takes exactly enough
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT * FROM graft.ml LIMIT 150").collect()
        .length === 150)
      assert(GraftScanProbe.entriesSeen(root).last === 2)
      // over the table size: everything, and everything comes back
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT * FROM graft.ml LIMIT 9999").collect()
        .length === 400)
      assert(GraftScanProbe.entriesSeen(root).last === 4)
      // a PRUNING-DECIDED filter (exact partition-column shape) keeps
      // the prefix: of the two surviving partitions, one covers LIMIT 10
      GraftScanProbe.reset(root)
      assert(spark.sql(
        "SELECT * FROM graft.ml WHERE p IN ('P0','P1') LIMIT 10").collect()
        .length === 10)
      assert(GraftScanProbe.entriesSeen(root).last === 1,
        s"decided filter + LIMIT must read a 1-partition prefix, saw " +
          s"${GraftScanProbe.entriesSeen(root)}")
      // a RESIDUAL filter never prefix-prunes (counts don't describe
      // its survivors) — all partitions read, all rows still found
      GraftScanProbe.reset(root)
      assert(spark.sql(
        "SELECT * FROM graft.ml WHERE k >= 396 LIMIT 10").collect()
        .length === 4)
      assert(GraftScanProbe.entriesSeen(root).last === 4,
        "a residual filter must disable the prefix")
      // delete evidence: physical counts overstate, prefix must not fire
      Deletes.deleteKeysMoR(spark, root, "k", (0L until 99L).toSeq)
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT * FROM graft.ml LIMIT 30").collect()
        .length === 30)
      assert(GraftScanProbe.entriesSeen(root).last === 4,
        "delete evidence must disable the prefix (counts unprovable)")
    } finally unregister("ml")
  }

  test("SUM answers from sidecars — proven on removed data; inexact shapes scan") {
    val root = Files.createTempDirectory("graft_magg_sum").toString
    // v: long with nulls (SUM skips them); d: double (never summable)
    val rows = (0L until 300L).map { i =>
      (if (i % 10 == 0) None else Some(i), i * 0.5, s"P${(i % 3).toInt}")
    }
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("v", "d", "p"), "p", Seq("v", "d"))
    register("msum", root)
    try {
      val expected = (0L until 300L).filter(_ % 10 != 0).sum
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT sum(v) FROM graft.msum").collect()
        .head.getLong(0) === expected)
      val grouped = spark.sql(
        "SELECT p, sum(v) FROM graft.msum GROUP BY p ORDER BY p")
        .collect().map(r => (r.getString(0), r.getLong(1))).toSeq
      assert(grouped === (0 until 3).map(g =>
        (s"P$g", (0L until 300L).filter(i => i % 3 == g && i % 10 != 0).sum)))
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        s"metadata SUM must not scan: ${GraftScanProbe.entriesSeen(root)}")
      // double SUM is order-dependent: the scan answers it
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT sum(d) FROM graft.msum").collect()
        .head.getDouble(0) === (0L until 300L).map(_ * 0.5).sum)
      assert(GraftScanProbe.entriesSeen(root).nonEmpty,
        "a double SUM must run the real scan")
      // the blunt proof: delete every data file except one footer probe
      val m = AtomicCommit.readManifest(root).get
      for ((pv, e) <- m.entries if pv != "P0"; g <- AtomicCommit.ownersOf(e)) {
        val dir = Paths.get(root, g, s"p=$pv")
        val s0 = Files.walk(dir)
        try s0.filter(f => Files.isRegularFile(f)).forEach(f => Files.delete(f))
        finally s0.close()
      }
      assert(spark.sql("SELECT sum(v), count(*) FROM graft.msum").collect()
        .head.let(r => (r.getLong(0), r.getLong(1))) === ((expected, 300L)))
    } finally unregister("msum")
  }

  test("pruning-decided filters keep aggregates metadata-answered; AVG rides sum+count") {
    val root = Files.createTempDirectory("graft_magg_filt").toString
    val rows = (0L until 300L).map(i =>
      (i / 100 * 1000 + i % 100, s"P${(i / 100).toInt}"))
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("k", "p"), "p", Seq("k"))
    register("mfilt", root)
    try {
      GraftScanProbe.reset(root)
      // an exact partition-column filter is fully decided by pruning:
      // the surviving entries' evidence answers, no scan
      assert(spark.sql(
        "SELECT count(*) FROM graft.mfilt WHERE p = 'P1'").collect()
        .head.getLong(0) === 100L)
      assert(spark.sql(
        "SELECT min(k), max(k), sum(k) FROM graft.mfilt WHERE p IN ('P0', 'P2')")
        .collect().head.let(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
        === ((0L, 2099L, (0L until 100L).sum + (0L until 100L).map(_ + 2000L).sum)))
      // AVG decomposes into the pushed sum+count partials
      assert(spark.sql("SELECT avg(k) FROM graft.mfilt WHERE p = 'P0'")
        .collect().head.getDouble(0) === (0L until 100L).sum.toDouble / 100)
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        s"decided-filter aggregates must not scan: " +
          s"${GraftScanProbe.entriesSeen(root)}")
      // a residual filter still runs the real scan
      GraftScanProbe.reset(root)
      assert(spark.sql(
        "SELECT count(*) FROM graft.mfilt WHERE k >= 1000").collect()
        .head.getLong(0) === 200L)
      assert(GraftScanProbe.entriesSeen(root).nonEmpty,
        "a residual filter must force the real scan")
    } finally unregister("mfilt")
  }

  test("SUM gates: all-null slices answer NULL; pre-sum sidecars retrofit through ANALYZE") {
    val root = Files.createTempDirectory("graft_magg_sumnull").toString
    // P0 carries values, P1 is ALL NULL for v: its evidence is the
    // absent sum + nulls==rows record, and the fold must treat it as
    // an empty contribution, not a gap
    val rows = (0L until 100L).map(i =>
      (if (i % 2 == 0) Some(i) else None, s"P${(i % 2).toInt}"))
    DataSkipping.commitWithStats(spark, root,
      rows.toDF("v", "p"), "p", Seq("v"))
    register("msn", root)
    try {
      GraftScanProbe.reset(root)
      val expected = (0L until 100L).filter(_ % 2 == 0).sum
      assert(spark.sql("SELECT sum(v) FROM graft.msn").collect()
        .head.getLong(0) === expected)
      val byP = spark.sql(
        "SELECT p, sum(v) FROM graft.msn GROUP BY p ORDER BY p").collect()
      assert(byP(0).getLong(1) === expected)
      assert(byP(1).isNullAt(1), "an all-null partition's SUM is NULL")
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        "both shapes must answer from metadata")
      // strip the sum fields (simulate a pre-r17 sidecar): SUM falls
      // back to the scan; ANALYZE retrofits; SUM is metadata again
      val m = AtomicCommit.readManifest(root).get
      for (g <- m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct) {
        val p = Paths.get(root, g, DataSkipping.StatsFile)
        val stripped = new String(Files.readAllBytes(p), "UTF-8")
          .replaceAll(""","sum":"[^"]*"""", "")
        Files.write(p, stripped.getBytes("UTF-8"))
      }
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT sum(v) FROM graft.msn").collect()
        .head.getLong(0) === expected)
      assert(GraftScanProbe.entriesSeen(root).nonEmpty,
        "a sidecar without sum evidence must scan")
      spark.sql("ANALYZE TABLE graft.msn COMPUTE STATISTICS FOR COLUMNS v")
      GraftScanProbe.reset(root)
      assert(spark.sql("SELECT sum(v) FROM graft.msn").collect()
        .head.getLong(0) === expected)
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        "ANALYZE must retrofit sum evidence")
    } finally unregister("msn")
  }

  test("null and escaped partition values: decided filters, pruning, and metadata answers stay exact") {
    val root = Files.createTempDirectory("graft_magg_null").toString
    // p = null writes the __HIVE_DEFAULT_PARTITION__ dir; 'a/b' writes
    // an ESCAPED dir (a%2Fb) — entry keys are raw dir names while row
    // values decode, the exact mismatch class the probe-escape mapping
    // and the sentinel rules exist for
    val rows = Seq((1L, Some("A")), (2L, Some("A")), (3L, None),
      (4L, Some("a/b")))
    import spark.implicits._
    DataSkipping.commitWithStats(spark, root, rows.toDF("k", "p"), "p",
      Seq("k"))
    register("mnull", root)
    try {
      def ks(sql: String): Set[Long] =
        spark.sql(sql).collect().map(_.getLong(0)).toSet
      // IS NOT NULL is a DECIDED filter: the sentinel entry prunes and
      // the null row never reaches the output (no residual exists)
      assert(ks("SELECT k FROM graft.mnull WHERE p IS NOT NULL")
        === Set(1L, 2L, 4L))
      assert(ks("SELECT k FROM graft.mnull WHERE p IS NULL") === Set(3L))
      // escape-aware pruning: the probe maps onto its directory name
      assert(ks("SELECT k FROM graft.mnull WHERE p = 'a/b'") === Set(4L))
      // the sentinel literal can never equal a decoded value
      assert(spark.sql("SELECT k FROM graft.mnull " +
        "WHERE p = '__HIVE_DEFAULT_PARTITION__'").collect().isEmpty)
      // metadata aggregates: count(*) includes the null row, count(p)/
      // min/max exclude it, and escaped values answer DECODED
      GraftScanProbe.reset(root)
      val r = spark.sql(
        "SELECT count(*), count(p), min(p), max(p) FROM graft.mnull")
        .collect().head
      assert((r.getLong(0), r.getLong(1), r.getString(2), r.getString(3))
        === ((4L, 3L, "A", "a/b")))
      val g = spark.sql(
        "SELECT p, count(*) FROM graft.mnull GROUP BY p").collect()
        .map(row => Option(row.getString(0)) -> row.getLong(1)).toMap
      assert(g === Map(Some("A") -> 2L, None -> 1L, Some("a/b") -> 1L))
      assert(spark.sql(
        "SELECT count(*) FROM graft.mnull WHERE p IS NOT NULL").collect()
        .head.getLong(0) === 3L)
      assert(GraftScanProbe.entriesSeen(root).isEmpty,
        s"all of the above answer from metadata: " +
          s"${GraftScanProbe.entriesSeen(root)}")
    } finally unregister("mnull")
  }

  private implicit class LetOps[A](private val a: A) {
    def let[B](f: A => B): B = f(a)
  }
}
