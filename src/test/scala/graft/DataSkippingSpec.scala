package graft

import java.nio.file.{Files, Paths}

import graft.sources.{AtomicCommit, DataSkipping}

/** The two claims [[graft.sources.DataSkipping]] makes: pruning is REAL
  * (provably-disjoint partitions are never even listed — checked through
  * `inputFiles`, the ground truth of what a scan touches) and SOUND (the
  * pruned result always equals the full-scan filter, including the cases
  * that trip naive implementations: missing stats, all-null partitions,
  * int64 bounds a double round-trip would mis-compare, supplementary
  * characters a UTF-16 compare would mis-order).
  */
class DataSkippingSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ds").toString

  private def rows(df: org.apache.spark.sql.DataFrame): Set[(Long, String, Long)] =
    df.select("k", "flag", "v").as[(Long, String, Long)].collect().toSet

  private def scannedFlags(df: org.apache.spark.sql.DataFrame): Set[String] =
    df.inputFiles.flatMap(f => "flag=([A-Z])".r.findFirstMatchIn(f).map(_.group(1))).toSet

  test("numeric pruning: only the intersecting partition's directory is scanned") {
    val root = freshRoot()
    val df = (
      (1L to 10L).map(i => (i, "A", i)) ++
      (100L to 110L).map(i => (i, "B", i)) ++
      (1000L to 1010L).map(i => (i, "C", i))).toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v"))
    val pruned = DataSkipping.readWhere(spark, root, "v", 100L, 120L)
    assert(rows(pruned) === rows(AtomicCommit.read(spark, root)
      .filter($"v" >= 100L && $"v" <= 120L)))
    assert(scannedFlags(pruned) === Set("B"),
      "partitions A and C are provably disjoint and must not be listed")
    // a range covering nothing scans nothing and still returns the schema
    val none = DataSkipping.readWhere(spark, root, "v", 2000L, 3000L)
    assert(none.count() === 0L)
    assert(none.inputFiles.isEmpty, "an all-pruned read must scan no files")
  }

  test("soundness: an un-annotated generation's partitions are always scanned") {
    val root = freshRoot()
    DataSkipping.commitWithStats(spark, root,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    // plain commit, NO stats: partition D holds an in-range row
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((500L, "D", 105L)).toDF("k", "flag", "v"), "flag")
    val got = DataSkipping.readWhere(spark, root, "v", 100L, 120L)
    assert(rows(got) === Set((500L, "D", 105L)),
      "no stats = no evidence = must scan (pruning may only narrow)")
    assert(scannedFlags(got) === Set("D"), "A's stats still prune it")
  }

  test("all-null partition is pruned: BETWEEN can never match null") {
    val root = freshRoot()
    val df = Seq[(Long, String, Option[Long])](
      (1L, "A", Some(5L)), (2L, "N", None), (3L, "N", None))
      .toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v"))
    val got = DataSkipping.readWhere(spark, root, "v", 0L, 1000L)
    assert(got.count() === 1L)
    assert(scannedFlags(got) === Set("A"),
      "the all-null partition holds no matchable row and must be pruned")
  }

  test("int64 exactness: bounds a double round-trip would conflate still prune") {
    val root = freshRoot()
    // 2^63-2 and 2^63-1 are distinct longs but the SAME double; a
    // double-based compare would keep partition A for the [2^63-1, 2^63-1]
    // probe it provably cannot match
    val big = Long.MaxValue - 1 // 9223372036854775806
    DataSkipping.commitWithStats(spark, root,
      Seq((1L, "A", big)).toDF("k", "flag", "v"), "flag", Seq("v"))
    val got = DataSkipping.readWhere(spark, root, "v", Long.MaxValue, Long.MaxValue)
    assert(got.count() === 0L)
    assert(got.inputFiles.isEmpty,
      "decimal-exact compare must prove A disjoint where double cannot")
    val hit = DataSkipping.readWhere(spark, root, "v", big, big)
    assert(hit.count() === 1L)
  }

  test("string pruning by code point, and correctness of the string path") {
    val root = freshRoot()
    val df = Seq(
      (1L, "A", "apple"), (2L, "A", "banana"),
      (3L, "B", "melon"), (4L, "B", "peach")).toDF("k", "flag", "name")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("name"))
    val got = DataSkipping.readWhere(spark, root, "name", "a", "c")
    assert(got.select("k").as[Long].collect().toSet === Set(1L, 2L))
    assert(scannedFlags(got) === Set("A"), "B's [melon, peach] is disjoint from [a, c]")
    // supplementary plane: U+1F600 must compare ABOVE U+FFFD (code-point
    // order, Spark's binary ordering) — UTF-16 compareTo gets this wrong
    assert(DataSkipping.cpCompare(new String(Character.toChars(0x1F600)), "�") > 0)
    assert("😀".compareTo("�") < 0,
      "the java ordering really does disagree — the guard is load-bearing")
  }

  test("bloom point lookup: present keys scan one partition, absent keys scan none") {
    val root = freshRoot()
    // high-cardinality interleaved keys: every partition spans the full
    // range, so MIN/MAX stats prune nothing here — the bloom must
    val rows = (0L until 300L).map(i => (i, s"P${(i % 3).toInt}", i * 7L))
    val staged = AtomicCommit.stage(spark, root,
      rows.toDF("k", "flag", "v"), "flag")
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, staged)
    // NO false negatives: every existing key found, scanning exactly its
    // own partition's directory
    for (k <- Seq(0L, 7L, 11L, 100L, 299L)) {
      val got = DataSkipping.readWhereEq(spark, root, "k", k)
      assert(got.select("v").as[Long].collect().toSeq === Seq(k * 7L), s"k=$k")
      val dirs = got.inputFiles.flatMap(
        f => "flag=(P[0-9])".r.findFirstMatchIn(f).map(_.group(1))).toSet
      assert(dirs === Set(s"P${k % 3}"),
        s"k=$k must scan only its own partition, scanned $dirs")
    }
    // absent key: all three blooms reject (fpp at this density ~1e-10)
    val none = DataSkipping.readWhereEq(spark, root, "k", 100000L)
    assert(none.count() === 0L)
    assert(none.inputFiles.isEmpty, "an all-rejected probe must scan nothing")
  }

  test("bloom soundness: all-null partitions reject, un-annotated generations scan") {
    val root = freshRoot()
    val staged = AtomicCommit.stage(spark, root,
      Seq[(Option[Long], String, Long)]((Some(1L), "A", 10L), (None, "N", 0L))
        .toDF("k", "flag", "v"), "flag")
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, staged)
    // the all-null partition has an EMPTY bloom: = probes never match null
    val got = DataSkipping.readWhereEq(spark, root, "k", 1L)
    assert(got.count() === 1L)
    assert(got.inputFiles.forall(_.contains("flag=A")))
    // a later generation WITHOUT bloom evidence must be scanned
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((5L, "B", 50L)).toDF("k", "flag", "v"), "flag")
    val b = DataSkipping.readWhereEq(spark, root, "k", 5L)
    assert(b.select("v").as[Long].collect().toSeq === Seq(50L))
  }

  test("cpCompare orders exactly like UTF-8 bytes (Spark's binary ordering), fuzzed") {
    // UTF-8 encoding preserves code-point order, so the two must agree in
    // SIGN on every pair — including supplementary-plane characters where
    // UTF-16 compareTo diverges. Fixed seed: the Det protocol, no flakes.
    def byteCompare(a: String, b: String): Int = {
      val (x, y) = (a.getBytes("UTF-8"), b.getBytes("UTF-8"))
      val n = math.min(x.length, y.length)
      var i = 0
      while (i < n) {
        val c = java.lang.Integer.compare(x(i) & 0xff, y(i) & 0xff)
        if (c != 0) return c
        i += 1
      }
      java.lang.Integer.compare(x.length, y.length)
    }
    val rnd = new scala.util.Random(42)
    def randString(): String = {
      val sb = new java.lang.StringBuilder
      (0 until rnd.nextInt(6)).foreach { _ =>
        val cp = rnd.nextInt(4) match {
          case 0 => rnd.nextInt(0x80)                  // ASCII
          case 1 => 0x80 + rnd.nextInt(0x800 - 0x80)   // 2-byte
          case 2 => // 3-byte BMP, skipping the surrogate block
            val c = 0x800 + rnd.nextInt(0x10000 - 0x800)
            if (c >= 0xD800 && c <= 0xDFFF) 0xFFFD else c
          case _ => 0x10000 + rnd.nextInt(0x10FFFF - 0x10000) // supplementary
        }
        sb.appendCodePoint(cp)
      }
      sb.toString
    }
    var checked = 0
    (1 to 2000).foreach { _ =>
      val (a, b) = (randString(), randString())
      assert(Integer.signum(DataSkipping.cpCompare(a, b)) ===
        Integer.signum(byteCompare(a, b)),
        s"disagree on ${a.codePoints.toArray.mkString(",")} vs " +
          s"${b.codePoints.toArray.mkString(",")}")
      checked += 1
    }
    assert(checked === 2000)
  }

  test("stats sidecar is immutable table metadata: survives vacuum, replays under time travel") {
    val root = freshRoot()
    DataSkipping.commitWithStats(spark, root,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    DataSkipping.commitWithStats(spark, root,
      (100L to 110L).map(i => (i, "B", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    AtomicCommit.vacuum(root)
    val got = DataSkipping.readWhere(spark, root, "v", 1L, 5L)
    assert(got.count() === 5L)
    assert(scannedFlags(got) === Set("A"))
    // the sidecar lives INSIDE its generation dir, so the generation's
    // lifecycle is its lifecycle
    val m = AtomicCommit.readManifest(root).get
    m.entries.values.toSeq.distinct.foreach { gen =>
      assert(Files.exists(Paths.get(root, gen, DataSkipping.StatsFile)))
    }
  }

  // ---- file-granular records (r13): pruning WITHIN a partition ----

  /** A table whose single data axis `v` is range-clustered into `nFiles`
    * files per partition directory — [[graft.sources.Compaction.recluster]]'s
    * layout, built directly through [[AtomicCommit.stageKeyed]].
    */
  private def clusteredCommit(root: String,
                              data: Seq[(Long, String, Long)],
                              nFiles: Int): Long = {
    import org.apache.spark.sql.functions.col
    val store = new graft.sources.PosixManifestStore(root)
    val parts = data.map(_._2).distinct.size
    val keyed = data.toDF("k", "flag", "v")
      .repartitionByRange(parts * nFiles, col("flag"), col("v"))
      .sortWithinPartitions(col("flag"), col("v"))
    val staged = AtomicCommit.stageKeyed(spark, root, store, keyed, "flag", None)
    DataSkipping.annotateStaged(spark, root, staged, Seq("v"))
    AtomicCommit.publish(root, store, staged)
  }

  test("file-granular: a 4-file clustered partition scans 1 of its 4 files") {
    val root = freshRoot()
    clusteredCommit(root, (0L until 400L).map(i => (i, "A", i)), 4)
    val dir = Paths.get(root).toFile.listFiles.filter(_.isDirectory).head
    val nFiles = Compat.parquetFiles(s"${dir.getAbsolutePath}/flag=A")
    assert(nFiles >= 3, s"layout should spread flag=A over ~4 files, got $nFiles")
    // the sidecar carries one envelope plus one record per file
    val m = AtomicCommit.readManifest(root).get
    val gen = m.entries("A")
    val recs = DataSkipping.readStats(root, gen).filter(_.col == "v")
    assert(recs.count(_.file.isEmpty) === 1, "exactly one partition envelope")
    assert(recs.count(_.file.nonEmpty) === nFiles, "one record per data file")
    assert(recs.find(_.file.isEmpty).get.min === Some("0"))
    assert(recs.find(_.file.isEmpty).get.max === Some("399"))
    // a narrow range inside one file's bounds scans exactly that file
    val got = DataSkipping.readWhere(spark, root, "v", 10L, 20L)
    assert(rows(got) === (10L to 20L).map(i => (i, "A", i)).toSet)
    assert(got.inputFiles.length === 1,
      s"expected 1 of $nFiles files, scanned ${got.inputFiles.length}")
  }

  test("per-owner gap: an appended partition's generations prune independently") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    // owner 1: v in [0,99]; owner 2 APPENDED: v in [300,399] — partition
    // A's combined range is [0,399] but each owner's slice is narrow
    DataSkipping.commitWithStats(spark, root,
      (0L until 100L).map(i => (i, "A", i)).toDF("k", "flag", "v"),
      "flag", Seq("v"))
    val s = AtomicCommit.stage(spark, root, store,
      (300L until 400L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", 1)
    DataSkipping.annotateStaged(spark, root, s, Seq("v"))
    AtomicCommit.publishAppend(root, store, s)
    // the gap between the owners: both slices provably disjoint → nothing
    // scanned, even though the PARTITION cannot be pruned as a whole
    val gap = DataSkipping.readWhere(spark, root, "v", 150L, 250L)
    assert(gap.count() === 0L)
    assert(gap.inputFiles.isEmpty,
      "each owner's recorded interval is disjoint — r12 scanned both")
    assert(gap.columns.contains("flag"))
    // a range inside ONE owner's slice scans only that owner's file
    val one = DataSkipping.readWhere(spark, root, "v", 320L, 330L)
    assert(rows(one) === (320L to 330L).map(i => (i, "A", i)).toSet)
    assert(one.inputFiles.length === 1, "only the second owner intersects")
    // spanning both scans both
    assert(DataSkipping.readWhere(spark, root, "v", 0L, 399L)
      .inputFiles.length === 2)
  }

  test("file-granular soundness: multi-partition result equals the full-scan filter") {
    val root = freshRoot()
    val data = (0L until 300L).map(i => (i, if (i % 3 == 0) "A" else if (i % 3 == 1) "B" else "C", i))
    clusteredCommit(root, data, 3)
    for ((lo, hi) <- Seq((0L, 299L), (50L, 60L), (99L, 101L), (250L, 400L))) {
      val pruned = DataSkipping.readWhere(spark, root, "v", lo, hi)
      val full = AtomicCommit.read(spark, root)
        .filter($"v" >= lo && $"v" <= hi)
      assert(rows(pruned) === rows(full), s"range [$lo,$hi]")
    }
    // the narrow probe touches strictly fewer files than the partition set
    val narrow = DataSkipping.readWhere(spark, root, "v", 50L, 60L)
    val all = AtomicCommit.read(spark, root).inputFiles.length
    assert(narrow.inputFiles.length < all,
      s"file pruning did nothing: ${narrow.inputFiles.length} of $all")
  }

  test("per-owner bloom: an appended generation whose bloom rejects is never scanned") {
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    // owner 1: keys 1..10; owner 2 APPENDED: keys 101..110 — same partition
    val s1 = AtomicCommit.stage(spark, root, store,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", 1)
    DataSkipping.annotateStagedBloom(spark, root, s1, Seq("k"))
    AtomicCommit.publish(root, store, s1)
    val s2 = AtomicCommit.stage(spark, root, store,
      (101L to 110L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", 1)
    DataSkipping.annotateStagedBloom(spark, root, s2, Seq("k"))
    AtomicCommit.publishAppend(root, store, s2)
    // a key in the APPENDED slice scans only the appended generation
    val hi = DataSkipping.readWhereEq(spark, root, "k", 105L)
    assert(rows(hi) === Set((105L, "A", 105L)))
    assert(hi.inputFiles.length === 1, "owner 1's bloom rejects 105")
    // a key in the BASE slice scans only the base generation
    val lo = DataSkipping.readWhereEq(spark, root, "k", 5L)
    assert(rows(lo) === Set((5L, "A", 5L)))
    assert(lo.inputFiles.length === 1, "owner 2's bloom rejects 5")
    // an absent key scans nothing at all
    val none = DataSkipping.readWhereEq(spark, root, "k", 5000L)
    assert(none.count() === 0L)
    assert(none.inputFiles.isEmpty)
  }

  test("countWhere answers fully-decided probes from metadata alone — proven on removed data") {
    val root = freshRoot()
    val df = (
      (1L to 10L).map(i => (i, "A", i)) ++
      (100L to 110L).map(i => (i, "B", i)) ++
      (1000L to 1010L).map(i => (i, "C", i))).toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v"))
    // mixed probe: A contained, B straddles, C disjoint
    assert(DataSkipping.countWhere(spark, root, "v", 1L, 105L) === 16L)
    // fully-decided probe: physically remove A's data files — the count
    // must still answer (nothing straddles, so nothing is scanned)
    val gen = AtomicCommit.readManifest(root).get.entries("A")
    val aDir = Paths.get(root, gen, "flag=A")
    val removed = Option(aDir.toFile.listFiles).get
      .filter(_.getName.endsWith(".parquet"))
    removed.foreach(f => Files.delete(f.toPath))
    assert(DataSkipping.countWhere(spark, root, "v", 0L, 50L) === 10L,
      "A is fully contained — its rows count from the sidecar, no I/O")
    assert(DataSkipping.countWhere(spark, root, "v", 2000L, 9999L) === 0L)
    // nulls never count toward a BETWEEN
    val root2 = freshRoot()
    DataSkipping.commitWithStats(spark, root2,
      Seq[(Long, String, Option[Long])]((1L, "D", Some(5L)), (2L, "D", None))
        .toDF("k", "flag", "v"), "flag", Seq("v"))
    assert(DataSkipping.countWhere(spark, root2, "v", 0L, 10L) === 1L)
  }

  test("file-granular bloom: a point probe scans 1 file of a multi-file partition") {
    import org.apache.spark.sql.functions.col
    val root = freshRoot()
    val store = new graft.sources.PosixManifestStore(root)
    val keyed = (0L until 400L).map(i => (i, "A", i)).toDF("k", "flag", "v")
      .repartitionByRange(4, col("k"))
      .sortWithinPartitions(col("k"))
    val staged = AtomicCommit.stageKeyed(spark, root, store, keyed, "flag", None)
    DataSkipping.annotateStagedBloom(spark, root, staged, Seq("k"))
    AtomicCommit.publish(root, store, staged)
    val gen = AtomicCommit.readManifest(root).get.entries("A")
    val recs = DataSkipping.readBlooms(root, gen).filter(_.col == "k")
    val nFiles = recs.count(_.file.nonEmpty)
    assert(recs.count(_.file.isEmpty) === 1, "one partition-level union bloom")
    assert(nFiles >= 3, s"expected ~4 file blooms, got $nFiles")
    // a present key scans exactly the one file holding it
    val hit = DataSkipping.readWhereEq(spark, root, "k", 250L)
    assert(rows(hit) === Set((250L, "A", 250L)))
    assert(hit.inputFiles.length === 1,
      s"expected 1 of $nFiles files, scanned ${hit.inputFiles.length}")
    // an absent key is rejected by the partition-level union already
    val none = DataSkipping.readWhereEq(spark, root, "k", 5000L)
    assert(none.count() === 0L)
    assert(none.inputFiles.isEmpty)
  }

  test("countWhereAll: conjunction counts from metadata, null-free containment only") {
    val root = freshRoot()
    // v and k correlated: containment provable on both for partition A
    val df = (
      (1L to 10L).map(i => (i, "A", i)) ++
      (100L to 110L).map(i => (i, "B", i))).toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v", "k"))
    assert(DataSkipping.countWhereAll(spark, root,
      Seq(("v", 0L, 50L), ("k", 0L, 50L))) === 10L)
    assert(DataSkipping.countWhereAll(spark, root,
      Seq(("v", 0L, 50L), ("k", 200L, 300L))) === 0L)
    // straddling on one predicate falls back to the residual scan
    assert(DataSkipping.countWhereAll(spark, root,
      Seq(("v", 5L, 105L), ("k", 0L, 1000L))) === 12L)
    // a column with nulls is NOT metadata-decidable in a conjunction
    val root2 = freshRoot()
    DataSkipping.commitWithStats(spark, root2,
      Seq[(Long, String, Option[Long])](
        (1L, "D", Some(5L)), (2L, "D", None), (3L, "D", Some(7L)))
        .toDF("k", "flag", "v"), "flag", Seq("v", "k"))
    assert(DataSkipping.countWhereAll(spark, root2,
      Seq(("v", 0L, 10L), ("k", 0L, 10L))) === 2L,
      "the null v row matches neither predicate conjunction")
  }

  test("single-file partitions carry no file records (pre-r13 byte format)") {
    val root = freshRoot()
    DataSkipping.commitWithStats(spark, root,
      (1L to 10L).map(i => (i, "A", i)).toDF("k", "flag", "v"), "flag", Seq("v"))
    val gen = AtomicCommit.readManifest(root).get.entries("A")
    val recs = DataSkipping.readStats(root, gen)
    assert(recs.nonEmpty && recs.forall(_.file.isEmpty),
      "a single-file partition's file record would duplicate its envelope")
    val body = new String(Files.readAllBytes(
      Paths.get(root, gen, DataSkipping.StatsFile)), "UTF-8")
    assert(!body.contains("\"file\""), "byte format must stay pre-r13")
  }

  test("local bloom positions equal the Spark-job hash positions bit-for-bit") {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    // the driver-local probe path must compute EXACTLY what the sidecar
    // writer's job computed, per declared type (xxhash64 hashes by type
    // width — an int-vs-bigint divergence would probe a different
    // filter and unsoundly prune)
    val salt = 7L
    val numBits = 1 << 10
    val numHashes = 4
    val cases: Seq[(Any, String)] = Seq(
      (42L, "bigint"), (42, "bigint"), (42, "int"), (-1L, "bigint"),
      (Long.MaxValue, "bigint"), (7, "smallint"),
      ("hello", "string"), ("", "string"), ("héllo🙂", "string"),
      (3.25, "double"), (3.25f, "float"), (3.25f, "double"),
      (new java.math.BigDecimal("123.45"), "decimal(10,2)"),
      (java.sql.Date.valueOf("2026-08-15"), "date"),
      (java.sql.Timestamp.valueOf("2026-08-15 12:34:56"), "timestamp"))
    cases.foreach { case (v, dt) =>
      val local = DataSkipping.localPositions(Seq(v), dt, numBits,
        numHashes, salt).head
      val cols = (0 until numHashes).map(h =>
        pmod(xxhash64(lit(v).cast(dt), lit(salt), lit(h)),
          lit(numBits.toLong)).as(s"p$h"))
      val row = spark.range(1).select(cols: _*).head()
      val job = (0 until numHashes).map(row.getLong)
      assert(local === Some(job), s"position mismatch for $v as $dt")
    }
    // an unparseable type yields None (callers admit), never a throw
    assert(DataSkipping.localPositions(Seq(1), "no_such_type", numBits,
      numHashes, salt) === Seq(None))
  }
}

/** File-count helper shared by the file-granular tests. */
private object Compat {
  def parquetFiles(dir: String): Int =
    Option(new java.io.File(dir).listFiles).getOrElse(Array.empty)
      .count(f => f.isFile && f.getName.endsWith(".parquet"))
}
