package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes, GraftFileIndex}

/** The generation FILE INDEX (`_graft_files.jsonl`): written by every
  * data-generation stage from the walk the commit already paid, so
  * readers plan file sets from driver metadata instead of one directory
  * LIST per (generation, partition) per query — the Iceberg record-the-
  * files move. An acceleration sidecar only: absent or unreadable, every
  * consumer falls back to the live listing with identical results.
  */
class FileIndexSpec extends SparkSpec {
  import spark.implicits._

  test("stages write the index; indexed file sets equal the live listing; absent or corrupt degrades to the listing") {
    val root = Files.createTempDirectory("graft_fidx").toString
    // several files per partition (salted), escaped dir value included
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 600).map(i => (i.toLong, i * 1.0, Seq("A", "B", "a/b")(i % 3)))
        .toDF("k", "v", "p"), "p", filesPerDir = 3)
    // an append: the second generation carries its own index
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((600L, 1.0, "A"), (601L, 2.0, "B")).toDF("k", "v", "p"), "p")
    val m = AtomicCommit.readManifest(root).get
    val gens = m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct
    assert(gens.size === 2)
    for (g <- gens)
      assert(Files.exists(Paths.get(root, g, DataSkipping.FilesFile)),
        s"generation $g must carry a file index")

    def liveListing(gen: String, pv: String): Seq[(String, Long)] = {
      val dir = s"$root/$gen/p=$pv"
      Option(Paths.get(dir).toFile.listFiles).getOrElse(Array.empty)
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).sortBy(_._1).toSeq
    }
    def indexed(gen: String, pv: String): Seq[(String, Long)] =
      DataSkipping.partitionFilesSized(root, gen, pv, s"$root/$gen/p=$pv")

    for ((pv, entry) <- m.entries; g <- AtomicCommit.ownersOf(entry)) {
      assert(indexed(g, pv) === liveListing(g, pv),
        s"index and listing disagree for ($g, $pv)")
      assert(indexed(g, pv).nonEmpty || liveListing(g, pv).isEmpty)
    }
    // several files actually landed for the salted commit (the index is
    // exercised beyond one-file-per-dir)
    assert(m.entries.keys.flatMap(pv =>
      AtomicCommit.ownersOf(m.entries(pv)).map(g => indexed(g, pv).size))
      .max > 1)

    val expect = AtomicCommit.read(spark, root)
      .collect().map(_.toString).sorted.toSeq

    // the CATALOG path (partitionFileLayout — the face's split source
    // and the V1 bridge's layout) plans from the index: same answers
    // as the V1 composition, with and without the batch face
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.fidx", root)
    def catRows(): Seq[String] = spark.sql(
      "SELECT k, v, p FROM graft.fidx").collect().map(_.toString).sorted.toSeq
    val catExpect = catRows()
    val faceRows = withSQLConf(
      graft.sources.GraftBatchScan.EnabledConf -> "true")(catRows())
    assert(faceRows === catExpect)

    // ABSENT index: delete it — the fallback listing plans the same
    // read (answers identical, partitionFilesSized re-derives live)
    val g0 = gens.head
    Files.delete(Paths.get(root, g0, DataSkipping.FilesFile))
    for ((pv, entry) <- m.entries
         if AtomicCommit.ownersOf(entry).contains(g0))
      assert(indexed(g0, pv) === liveListing(g0, pv),
        s"fallback and listing disagree for ($g0, $pv)")
    assert(AtomicCommit.read(spark, root)
      .collect().map(_.toString).sorted.toSeq === expect,
      "deleting the index must not change what a read returns")

    // CORRUPT index: unparsable bytes degrade to the listing, loudly
    // nowhere — an acceleration sidecar must never fail a read
    Files.write(Paths.get(root, g0, DataSkipping.FilesFile),
      "not json at all {{{".getBytes)
    for ((pv, entry) <- m.entries
         if AtomicCommit.ownersOf(entry).contains(g0))
      assert(indexed(g0, pv) === liveListing(g0, pv))
    assert(AtomicCommit.read(spark, root)
      .collect().map(_.toString).sorted.toSeq === expect)
    assert(catRows() === catExpect,
      "a corrupt index must degrade the catalog read to the listing")
    assert(withSQLConf(
      graft.sources.GraftBatchScan.EnabledConf -> "true")(catRows())
      === catExpect)
    spark.conf.unset("spark.graft.table.fidx")
  }

  /** Execute `df`, then return its file-source scan leaves (simple
    * scan/filter/union shapes — no exchange, so no AQE re-plan).
    */
  private def scanLeaves(df: DataFrame): Seq[FileSourceScanExec] = {
    df.collect()
    df.queryExecution.executedPlan.collect { case f: FileSourceScanExec => f }
  }

  test("V1 scans PLAN from the index: GraftFileIndex leaves, zero-listing partition pruning, byte-exact stats; deleting the index reverts the leaf") {
    val root = Files.createTempDirectory("graft_fidx_plan").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 300).map(i => (i.toLong, i * 1.0, Seq("A", "B", "C")(i % 3)))
        .toDF("k", "v", "p"), "p", filesPerDir = 3)
    val all = AtomicCommit.read(spark, root)
    val leaves = scanLeaves(all)
    assert(leaves.nonEmpty &&
      leaves.forall(_.relation.location.isInstanceOf[GraftFileIndex]),
      s"an indexed generation must serve V1 scans from the file index\n${
        all.queryExecution.executedPlan}")
    // inputFiles render QUALIFIED, like the listed path's statuses —
    // downstream URI parsing (and _metadata.file_path) must not change
    assert(all.inputFiles.nonEmpty &&
      all.inputFiles.forall(_.startsWith("file:")),
      s"index-backed statuses must be fs-qualified: ${all.inputFiles.head}")
    // exact plan statistics from the index: sizeInBytes equals the sum
    // of the real file lengths (what the listed path would report)
    val realBytes = (for (pv <- Seq("A", "B", "C");
        f <- Paths.get(root, AtomicCommit.ownersOf(
          AtomicCommit.readManifest(root).get.entries(pv)).head, s"p=$pv")
          .toFile.listFiles if f.getName.endsWith(".parquet"))
      yield f.length).sum
    assert(leaves.map(_.relation.location.sizeInBytes).sum === realBytes)

    // partition pruning flows through listFiles: one partition of three,
    // exactly its on-disk files — no directory was listed to decide that
    val aFiles = Paths.get(root, AtomicCommit.ownersOf(
        AtomicCommit.readManifest(root).get.entries("A")).head, "p=A")
      .toFile.listFiles.count(_.getName.endsWith(".parquet"))
    val one = AtomicCommit.read(spark, root).filter(col("p") === "A")
    assert(one.count() === 100)
    val pruned = scanLeaves(one)
    assert(pruned.map(_.metrics("numFiles").value).sum === aFiles,
      s"a p='A' scan must read exactly partition A's $aFiles files")
    assert(aFiles < 9, "pruning must have excluded B and C's files")

    // drop the index: the same read falls back to the listing leaf,
    // rows identical
    val gen = AtomicCommit.ownersOf(
      AtomicCommit.readManifest(root).get.entries("A")).head
    val expect = all.collect().map(_.toString).sorted.toSeq
    Files.delete(Paths.get(root, gen, DataSkipping.FilesFile))
    val relisted = AtomicCommit.read(spark, root)
    assert(scanLeaves(relisted)
      .forall(!_.relation.location.isInstanceOf[GraftFileIndex]),
      "without a sidecar the read must plan from the live listing")
    assert(relisted.collect().map(_.toString).sorted.toSeq === expect)
  }

  test("delete read paths ride the indexed plan unchanged: positional MoR, equality MoR, and file-granular pruned reads answer identically with and without the index") {
    val root = Files.createTempDirectory("graft_fidx_del").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 400).map(i => (i.toLong, i % 7, Seq("A", "B")(i % 2)))
        .toDF("k", "g", "p"), "p", filesPerDir = 2)
    // positional merge-on-read (addresses by _metadata file/row_index —
    // the columns the indexed leaf must keep serving) + an equality record
    Deletes.deleteWhereMoR(spark, root, col("k") % 5 === 0)
    Deletes.deleteKeysMoR(spark, root, "g", Seq(3))
    val expect = (0 until 400).filter(i => i % 5 != 0 && i % 7 != 3)
      .map(i => s"[$i,${i % 7},${Seq("A", "B")(i % 2)}]").sorted
    val got = AtomicCommit.read(spark, root).collect()
      .map(_.toString).sorted.toSeq
    assert(got === expect, "MoR deletes must apply on the indexed plan")
    // the DATA generation still plans from its index (delete evidence
    // rides sidecars/bitmaps, not the scan shape)
    assert(scanLeaves(AtomicCommit.read(spark, root))
      .exists(_.relation.location.isInstanceOf[GraftFileIndex]))

    // strip every generation's index: same rows through the listing path
    val m = AtomicCommit.readManifest(root).get
    for (g <- m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct;
         p = Paths.get(root, g, DataSkipping.FilesFile) if Files.exists(p))
      Files.delete(p)
    assert(AtomicCommit.read(spark, root).collect()
      .map(_.toString).sorted.toSeq === got)
  }

  test("file-granular pruned reads (readWhere over a reclustered layout) plan from the index and keep row parity with the listing path") {
    val root = Files.createTempDirectory("graft_fidx_rw").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 1000).map(i => (i.toLong, i % 10, if (i < 500) "L" else "H"))
        .toDF("k", "b", "p"), "p", filesPerDir = 1)
    // sorted, stats-annotated layout → per-file min/max evidence on k
    graft.sources.Compaction.recluster(spark, root,
      sortCols = Seq("k"), filesPerDir = 4, statsCols = Seq("k"))
    val q = DataSkipping.readWhere(spark, root, "k", 10L, 60L)
    val rows = q.collect().map(_.toString).sorted.toSeq
    assert(rows.size === 51)
    val leaves = scanLeaves(DataSkipping.readWhere(spark, root, "k", 10L, 60L))
    assert(leaves.forall(_.relation.location.isInstanceOf[GraftFileIndex]),
      "the explicit-paths pruned read must serve from the index")
    assert(leaves.map(_.metrics("numFiles").value).sum < 8,
      "file evidence must keep the indexed read file-granular")
    // listing-path parity
    val m = AtomicCommit.readManifest(root).get
    for (g <- m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct;
         p = Paths.get(root, g, DataSkipping.FilesFile) if Files.exists(p))
      Files.delete(p)
    assert(DataSkipping.readWhere(spark, root, "k", 10L, 60L)
      .collect().map(_.toString).sorted.toSeq === rows)
  }

  test("the stage-time digest prices whole snapshots in O(generations): byte/file totals exact, partial ownership and absence fall back to the exact path") {
    import graft.sources.TableStats
    val root = Files.createTempDirectory("graft_digest").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 300).map(i => (i.toLong, Seq("A", "B", "C")(i % 3)))
        .toDF("k", "p"), "p", filesPerDir = 2)
    val m1 = AtomicCommit.readManifest(root).get
    val g1 = AtomicCommit.ownersOf(m1.entries("A")).head
    assert(Files.exists(Paths.get(root, g1, DataSkipping.DigestFile)),
      "every staged generation must carry a digest")
    def realBytes(m: AtomicCommit.Manifest): Long =
      (for ((pv, e) <- m.entries.toSeq; g <- AtomicCommit.ownersOf(e);
            f <- Paths.get(root, g, s"p=$pv").toFile.listFiles
            if f.getName.endsWith(".parquet")) yield f.length).sum
    assert(TableStats.sizeInBytes(root, m1) === realBytes(m1),
      "the digest-priced snapshot must match the on-disk byte total")

    // REPLACE one partition: gen1 becomes PARTIALLY owned (A, B only) —
    // the digest no longer applies to it and the exact path must price
    // the snapshot without gen1's superseded partition C
    AtomicCommit.commitReplacePartitions(spark, root,
      (0 until 40).map(i => (i.toLong, "C")).toDF("k", "p"), "p")
    val m2 = AtomicCommit.readManifest(root).get
    assert(AtomicCommit.ownersOf(m2.entries("A")).head === g1 &&
      AtomicCommit.ownersOf(m2.entries("C")).head != g1)
    assert(TableStats.sizeInBytes(root, m2) === realBytes(m2),
      "a partially-owned generation must fall back to per-partition bytes")

    // DESCRIBE DETAIL num_files: digest-backed count equals the live one
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.fdig", root)
    try {
      val reported = spark.sql("DESCRIBE DETAIL graft.fdig")
        .collect().head.getAs[Long]("num_files")
      val live = (for ((pv, e) <- m2.entries.toSeq;
            g <- AtomicCommit.ownersOf(e);
            f <- Paths.get(root, g, s"p=$pv").toFile.listFiles
            if f.getName.endsWith(".parquet")) yield 1L).sum
      assert(reported === live)
      // digests gone: everything still answers identically
      for (g <- m2.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct;
           p = Paths.get(root, g, DataSkipping.DigestFile)
           if Files.exists(p)) Files.delete(p)
      assert(spark.sql("DESCRIBE DETAIL graft.fdig")
        .collect().head.getAs[Long]("num_files") === live)
    } finally spark.conf.unset("spark.graft.table.fdig")
  }

  test("authority: a file smuggled into a published generation is not part of the table on indexed paths; removing the index re-exposes it to the listing fallback") {
    val root = Files.createTempDirectory("graft_fidx_auth").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.fauth", root)
    try {
      // the batch face plans its splits from partitionFileLayout — the
      // index-backed path (V1 reads discover via Spark's own listing,
      // which is exactly the undefined-visibility split the contract
      // documents)
      def faceRows(): Int = withSQLConf(
        graft.sources.GraftBatchScan.EnabledConf -> "true") {
        spark.sql("SELECT k, p FROM graft.fauth WHERE p = 'A'")
          .collect().length
      }
      assert(faceRows() === 1)
      // violate immutability: copy B's data file into A's directory
      // behind the format's back (rows read back AS p=A there)
      val m = AtomicCommit.readManifest(root).get
      val gen = AtomicCommit.ownersOf(m.entries("A")).head
      val bFile = Paths.get(root, gen, "p=B").toFile.listFiles
        .filter(_.getName.endsWith(".parquet")).head
      Files.copy(bFile.toPath,
        Paths.get(root, gen, "p=A", "smuggled.parquet"))
      // indexed planning: the foreign file does not exist for the table
      assert(faceRows() === 1,
        "the index is the generation's file catalog — files outside it " +
          "are outside the table")
      // without the index, the listing fallback discovers it — the
      // documented consequence of violating generation immutability
      Files.delete(Paths.get(root, gen, DataSkipping.FilesFile))
      assert(faceRows() === 2)
    } finally {
      spark.conf.unset("spark.graft.table.fauth")
    }
  }

  test("_metadata.file_modification_time parity: indexed plans report the true file stamps, identical to the listed fallback") {
    val root = Files.createTempDirectory("graft_fidx_mt").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    def stamped(): Seq[String] = AtomicCommit.read(spark, root)
      .select(col("k"),
        col("_metadata.file_modification_time").cast("long").as("mt"))
      .collect().map(_.toString).sorted.toSeq
    val probe = AtomicCommit.read(spark, root)
    assert(scanLeaves(probe)
      .forall(_.relation.location.isInstanceOf[GraftFileIndex]),
      "premise: the indexed plan serves this read")
    val indexed = stamped()
    assert(AtomicCommit.read(spark, root)
      .select(col("_metadata.file_modification_time").cast("long"))
      .collect().forall(_.getLong(0) > 0L),
      "index-backed metadata must carry real stamps, not epoch-0")
    val m = AtomicCommit.readManifest(root).get
    for (g <- m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct;
         p = Paths.get(root, g, DataSkipping.FilesFile) if Files.exists(p))
      Files.delete(p)
    assert(stamped() === indexed,
      "the listed fallback must report the same modification times")
  }

  test("a pre-mtime index is upgraded in place on first read (one stat pass) and then serves the V1 FileIndex path with true stamps") {
    val root = Files.createTempDirectory("graft_fidx_old").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    val expect = AtomicCommit.read(spark, root)
      .collect().map(_.toString).sorted.toSeq
    val m = AtomicCommit.readManifest(root).get
    val gens = m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct
    // rewrite each index in the r19 line shape: no mtime field
    for (g <- gens) {
      val lines = for (pv <- m.entries.keys.toSeq.sorted
             if AtomicCommit.ownersOf(m.entries(pv)).contains(g);
           f <- Paths.get(root, g, s"p=$pv").toFile.listFiles.sortBy(_.getName)
             if f.getName.endsWith(".parquet"))
        yield s"""{"partition": "$pv", "file": "${f.getName}", "bytes": ${
          f.length}}"""
      Files.write(Paths.get(root, g, DataSkipping.FilesFile),
        lines.mkString("", "\n", "\n").getBytes)
    }
    // evidence consumers: names and bytes come from the index; the read
    // also triggers the one-time backfill
    for ((pv, e) <- m.entries; g <- AtomicCommit.ownersOf(e)) {
      val live = Paths.get(root, g, s"p=$pv").toFile.listFiles
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).sortBy(_._1).toSeq
      assert(DataSkipping.partitionFilesSized(
        root, g, pv, s"$root/$g/p=$pv") === live)
    }
    // the sidecar now carries stamps on disk…
    for (g <- gens)
      assert(new String(Files.readAllBytes(
        Paths.get(root, g, DataSkipping.FilesFile))).contains("\"mtime\""),
        s"backfill must rewrite $g's index with mtimes")
    // …and the V1 path serves from the index again, true stamps included
    val upgraded = AtomicCommit.read(spark, root)
    assert(scanLeaves(upgraded)
      .exists(_.relation.location.isInstanceOf[GraftFileIndex]),
      "an upgraded index must serve the V1 FileIndex path")
    assert(upgraded.collect().map(_.toString).sorted.toSeq === expect)
    assert(AtomicCommit.read(spark, root)
      .select(col("_metadata.file_modification_time").cast("long"))
      .collect().forall(_.getLong(0) > 0L))
  }

  test("an mtime-less index whose backfill cannot complete (a stat fails) keeps serving evidence and V1 scans decline to the listing") {
    val root = Files.createTempDirectory("graft_fidx_ro").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    val expect = AtomicCommit.read(spark, root)
      .collect().map(_.toString).sorted.toSeq
    val m = AtomicCommit.readManifest(root).get
    val gens = m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct
    for (g <- gens) {
      val lines = (for (pv <- m.entries.keys.toSeq.sorted
             if AtomicCommit.ownersOf(m.entries(pv)).contains(g);
           f <- Paths.get(root, g, s"p=$pv").toFile.listFiles.sortBy(_.getName)
             if f.getName.endsWith(".parquet"))
        yield s"""{"partition": "$pv", "file": "${f.getName}", "bytes": ${
          f.length}}""") :+
        // a record whose file does not exist on disk: the backfill's
        // stat pass fails and must leave the sidecar untouched
        """{"partition": "zz", "file": "ghost.parquet", "bytes": 1}"""
      Files.write(Paths.get(root, g, DataSkipping.FilesFile),
        lines.mkString("", "\n", "\n").getBytes)
    }
    val relisted = AtomicCommit.read(spark, root)
    assert(scanLeaves(relisted)
      .forall(!_.relation.location.isInstanceOf[GraftFileIndex]),
      "an un-upgradable mtime-less index must not serve the V1 path")
    assert(relisted.collect().map(_.toString).sorted.toSeq === expect)
    for (g <- gens)
      assert(!new String(Files.readAllBytes(
        Paths.get(root, g, DataSkipping.FilesFile))).contains("\"mtime\""),
        "a failed backfill must not rewrite the sidecar")
    // names and bytes still serve evidence consumers from the index
    for ((pv, e) <- m.entries; g <- AtomicCommit.ownersOf(e)) {
      val live = Paths.get(root, g, s"p=$pv").toFile.listFiles
        .filter(f => f.isFile && f.getName.endsWith(".parquet"))
        .map(f => f.getName -> f.length).sortBy(_._1).toSeq
      assert(DataSkipping.partitionFilesSized(
        root, g, pv, s"$root/$g/p=$pv") === live)
    }
  }
}
