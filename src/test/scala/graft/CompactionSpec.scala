package graft

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.{AtomicCommit, Compaction, DataSkipping}

/** [[graft.sources.Compaction]]: small-file rewrite of a Hive-partitioned
  * dataset. Pins the two things that matter — the file count actually
  * collapses to the target per directory, and the rewritten dataset is
  * CONTENT-IDENTICAL under the q79 checksum aggregation (any row loss,
  * type widening, or partition misassignment breaks it).
  */
class CompactionSpec extends SparkSpec {

  private def checksum(path: String) =
    spark.read.parquet(path)
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(col("n_chars")).as("sc"),
        sum(length(col("text"))).as("st"),
        min(col("doc_id")).as("mn"), max(col("doc_id")).as("mx"))
      .orderBy("lang")
      .collect().toSeq

  private def filesPerLeafDir(root: String): Map[String, Long] = {
    val s = Files.walk(Paths.get(root))
    try s.iterator().asScala
      .filter(_.toString.endsWith(".parquet"))
      .toSeq.groupBy(_.getParent.toString)
      .map { case (d, fs) => d -> fs.size.toLong }
    finally s.close()
  }

  test("compaction collapses a multi-batch mess to one file per dir, content-identical") {
    val dir = graft.Scratch.perJvm("graft_compact_spec") + "/data"
    // simulate N ingestion batches: 6 writer tasks each drop a sliver into
    // every (lang, source) directory
    Tables.documents(spark, sf0001).repartition(6)
      .write.mode("overwrite").partitionBy("lang", "source").parquet(dir)
    val before = checksum(dir)
    val perDirBefore = filesPerLeafDir(dir)
    assert(perDirBefore.values.max > 1,
      s"test setup must create a small-file mess: $perDirBefore")

    val (nBefore, nAfter) = Compaction.compactPartitioned(
      spark, dir, Seq("lang", "source"))
    assert(nBefore === perDirBefore.values.sum)
    assert(nAfter < nBefore, s"$nBefore -> $nAfter")
    val perDirAfter = filesPerLeafDir(dir)
    assert(perDirAfter.values.max === 1, s"one file per dir: $perDirAfter")
    assert(perDirAfter.keySet === perDirBefore.keySet,
      "compaction must preserve the partition directory tree")
    assert(checksum(dir) === before, "content must round-trip exactly")
  }

  test("zero-padded partition values survive compaction verbatim (no type inference)") {
    val dir = graft.Scratch.perJvm("graft_compact_pad") + "/data"
    // month=01 … month=04: default partition inference would read these as
    // int and REWRITE the directories as month=1 — renamed tree, broken
    // string filters downstream
    Tables.documents(spark, sf0001)
      .withColumn("month", format_string("%02d", (pmod(col("doc_id"), lit(4)) + 1)))
      .repartition(5)
      .write.mode("overwrite").partitionBy("month").parquet(dir)
    val dirsBefore = filesPerLeafDir(dir).keySet
    assert(dirsBefore.exists(_.contains("month=01")), s"setup: $dirsBefore")
    val before = checksum(dir)
    Compaction.compactPartitioned(spark, dir, Seq("month"))
    assert(filesPerLeafDir(dir).keySet === dirsBefore,
      "zero-padded directory names must round-trip unchanged")
    assert(checksum(dir) === before)
  }

  test("a crashed swap self-heals on the next invocation") {
    val dir = graft.Scratch.perJvm("graft_compact_heal") + "/data"
    Tables.documents(spark, sf0001).repartition(3)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = checksum(dir)
    // simulate dying between the two renames: path gone, .old present
    Files.move(Paths.get(dir), Paths.get(dir + ".graft_compact_old"))
    Compaction.compactPartitioned(spark, dir, Seq("lang"))
    assert(checksum(dir) === before, "restored-then-compacted content must match")
    assert(!Files.exists(Paths.get(dir + ".graft_compact_old")))
  }

  test("filesPerDir > 1 bounds the per-dir count and still round-trips") {
    val dir = graft.Scratch.perJvm("graft_compact_spec3") + "/data"
    Tables.documents(spark, sf0001).repartition(8)
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = checksum(dir)
    Compaction.compactPartitioned(spark, dir, Seq("lang"), filesPerDir = 3)
    val perDir = filesPerLeafDir(dir)
    assert(perDir.values.max <= 3, s"at most 3 files per dir: $perDir")
    assert(checksum(dir) === before)
  }

  test("compactAtomicTable: filesPerDir > 1 actually splits on disk (and vacuum stays opt-out)") {
    import spark.implicits._
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft_ac_split").toString
    val rows = (0 until 120).map { i =>
      (i.toLong, s"text-$i", if (i % 2 == 0) "de" else "fr", 10L + i)
    }
    AtomicCommit.commitReplacePartitions(spark, root,
      rows.toDF("doc_id", "text", "lang", "n_chars"), "lang")
    val rowsBefore = AtomicCommit.read(spark, root)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    val (_, after) = Compaction.compactAtomicTable(spark, root, filesPerDir = 3)
    // per-DIRECTORY counts through the manifest: the salt must spread each
    // partition across >1 writing task (the r11 version silently collapsed
    // every dir back to one file) while honoring the <= filesPerDir bound
    val m = AtomicCommit.readManifest(root).get
    val perDir = m.entries.map { case (v, gen) =>
      v -> Compaction.countDataFiles(s"$root/$gen/lang=$v")
    }
    assert(perDir.values.forall(n => n >= 1 && n <= 3),
      s"1..3 files per dir expected: $perDir")
    assert(perDir.values.max > 1,
      s"the filesPerDir split must actually happen: $perDir")
    assert(after === perDir.values.sum)
    // default vacuum policy: the superseded generation SURVIVES (snapshot
    // readers may hold it); an explicit vacuum then reclaims it
    val gens = java.nio.file.Paths.get(root).toFile.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("g"))
    assert(gens.length === 2, gens.map(_.getName).mkString(","))
    assert(AtomicCommit.vacuum(root).size === 1)
    assert(AtomicCommit.read(spark, root)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet === rowsBefore)
  }

  test("compactAtomicTable folds append-grown owner lists back to one generation") {
    import spark.implicits._
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft_ac_fold").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((0L, "de", 0L)).toDF("k", "lang", "v"), "lang")
    for (b <- 1 to 3) // streaming-shaped appends: owner list grows to 4
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((b.toLong, "de", b.toLong)).toDF("k", "lang", "v"), "lang")
    assert(AtomicCommit.ownersOf(
      AtomicCommit.readManifest(root).get.entries("de")).size === 4)
    val rowsBefore = AtomicCommit.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toSet
    val (before, after) = Compaction.compactAtomicTable(spark, root,
      vacuumNow = true)
    assert(before === 4L && after === 1L, s"$before -> $after")
    assert(AtomicCommit.ownersOf(
      AtomicCommit.readManifest(root).get.entries("de")).size === 1)
    assert(AtomicCommit.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toSet === rowsBefore)
    // the folded-away generations are really gone from disk
    val gens = java.nio.file.Paths.get(root).toFile.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("g"))
    assert(gens.length === 1)
  }

  test("compactAtomicTable: statsCols re-annotates, so skipping survives the rewrite") {
    import spark.implicits._
    import graft.sources.{AtomicCommit, DataSkipping}
    val root = java.nio.file.Files.createTempDirectory("graft_ac_cstats").toString
    DataSkipping.commitWithStats(spark, root,
      ((1L to 10L).map(i => (i, "A", i)) ++ (100L to 110L).map(i => (i, "B", i)))
        .toDF("k", "flag", "v"), "flag", Seq("v"))
    Compaction.compactAtomicTable(spark, root, filesPerDir = 1,
      vacuumNow = true, statsCols = Seq("v"))
    // the compacted generation carries fresh evidence: the probe prunes
    // to B's single directory instead of scanning the whole table
    val got = DataSkipping.readWhere(spark, root, "v", 100L, 120L)
    assert(got.count() === 11L)
    assert(got.inputFiles.forall(_.contains("flag=B")),
      "compaction without re-annotation would have lost the pruning")
  }

  test("compactAtomicTable: fragmented generations collapse to one, windowless, rows identical") {
    import spark.implicits._
    import graft.sources.AtomicCommit
    val root = java.nio.file.Files.createTempDirectory("graft_ac_compact").toString
    // three fragmenting commits: partitions spread across generations
    for (batch <- 0 until 3) {
      val rows = (0 until 40).map { i =>
        (batch * 100L + i, s"t$batch-$i", if (i % 2 == 0) "de" else "fr", 10L + i)
      }
      AtomicCommit.commitReplacePartitions(spark, root,
        // append semantics for the test: merge prior rows so nothing is lost
        AtomicCommit.readManifest(root).map(_ => AtomicCommit.read(spark, root))
          .map(_.unionByName(rows.toDF("doc_id", "text", "lang", "n_chars")))
          .getOrElse(rows.toDF("doc_id", "text", "lang", "n_chars")),
        "lang")
    }
    val rowsBefore = AtomicCommit.read(spark, root)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rowsBefore.size === 120)
    val (before, after) = Compaction.compactAtomicTable(spark, root,
      filesPerDir = 1, vacuumNow = true)
    assert(before >= after, s"$before -> $after")
    assert(after <= 2L, s"one file per partition dir expected, got $after")
    // one generation owns everything; superseded fragments vacuumed
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.values.toSet.size === 1)
    val gens = java.nio.file.Paths.get(root).toFile.listFiles
      .filter(f => f.isDirectory && f.getName.startsWith("g"))
    assert(gens.length === 1, gens.map(_.getName).mkString(","))
    // content untouched
    val rowsAfter = AtomicCommit.read(spark, root)
      .select("doc_id", "text", "lang", "n_chars")
      .as[(Long, String, String, Long)].collect().toSet
    assert(rowsAfter === rowsBefore)
  }

  test("recluster: arrival-order layout becomes file-prunable, content and history intact") {
    import spark.implicits._
    import graft.sources.{AtomicCommit, DataSkipping}
    val root = java.nio.file.Files.createTempDirectory("graft_ac_reclus").toString
    // the worst layout for skipping: every partition holds a hash-spread
    // slice of the full v range, committed with stats that prove nothing
    val shuffled = (0L until 1200L)
      .map(i => (i, s"p${(i * 2654435761L % 4).abs}", i))
      .toDF("k", "flag", "v")
    val v1 = DataSkipping.commitWithStats(spark, root, shuffled, "flag", Seq("v"))
    val preRows = AtomicCommit.read(spark, root)
      .select("k", "flag", "v").as[(Long, String, Long)].collect().toSet
    val narrowBefore = DataSkipping.readWhere(spark, root, "v", 100L, 150L)
    assert(narrowBefore.inputFiles.length === 4,
      "pre-recluster, every partition's envelope spans the range — all scanned")

    val (before, after) = Compaction.recluster(spark, root, Seq("v"),
      filesPerDir = 4)
    assert(before === 4 && after >= 4, s"$before -> $after")

    // rows byte-identical, partition membership untouched
    val postRows = AtomicCommit.read(spark, root)
      .select("k", "flag", "v").as[(Long, String, Long)].collect().toSet
    assert(postRows === preRows)
    // each directory now holds ~filesPerDir files, each a narrow v range,
    // and the regenerated file-granular sidecar prunes WITHIN partitions:
    // the same probe touches ~1 file per partition instead of everything
    val narrowAfter = DataSkipping.readWhere(spark, root, "v", 100L, 150L)
    assert(narrowAfter.select("k", "flag", "v").as[(Long, String, Long)]
      .collect().toSet === preRows.filter(r => r._3 >= 100L && r._3 <= 150L))
    val scanned = narrowAfter.inputFiles.length
    assert(scanned <= 8 && scanned < after,
      s"file pruning should cut the scan well below $after files, got $scanned")

    // the pre-recluster snapshot stays readable until vacuum
    assert(AtomicCommit.readAt(spark, root, v1)
      .select("k", "flag", "v").as[(Long, String, Long)].collect().toSet === preRows)
    // and vacuum (retention 1) drops the superseded layout
    AtomicCommit.vacuum(root)
    assert(AtomicCommit.read(spark, root).count() === 1200L)
  }

  test("z-order recluster: range predicates on EITHER dimension prune files") {
    import spark.implicits._
    import graft.sources.{AtomicCommit, DataSkipping}
    val root = java.nio.file.Files.createTempDirectory("graft_ac_zorder").toString
    // a 64x64 grid per partition: every (x, y) combination present, so a
    // lexicographic sort on (x, y) would leave y completely unclustered
    val grid = for { x <- 0L until 64L; y <- 0L until 64L } yield (x * 64 + y, "A", x, y)
    DataSkipping.commitWithStats(spark, root,
      grid.toDF("k", "flag", "x", "y"), "flag", Seq("x", "y"))
    val pre = AtomicCommit.read(spark, root)
      .select("k", "x", "y").as[(Long, Long, Long)].collect().toSet

    val (_, after) = Compaction.reclusterZorder(spark, root, Seq("x", "y"),
      filesPerDir = 16)
    assert(after >= 12, s"expected ~16 files, got $after")
    // content identical
    assert(AtomicCommit.read(spark, root)
      .select("k", "x", "y").as[(Long, Long, Long)].collect().toSet === pre)

    // a narrow slab on EACH dimension prunes to ~its intersecting squares:
    // 16 files tile the 64x64 space ~4x4, so an 8-wide slab on x or y
    // intersects ~4-8 of them — never all. Lexicographic (x, y) order
    // would make the y slab scan every file.
    def filesFor(c: String): Int =
      DataSkipping.readWhere(spark, root, c, 0L, 7L).inputFiles.length
    val (fx, fy) = (filesFor("x"), filesFor("y"))
    assert(fx < after / 2, s"x slab scanned $fx of $after files")
    assert(fy < after / 2, s"y slab scanned $fy of $after files")
    // correctness of both slabs
    assert(DataSkipping.readWhere(spark, root, "x", 0L, 7L)
      .select("k", "x", "y").as[(Long, Long, Long)].collect().toSet ===
      pre.filter(_._2 <= 7L))
    assert(DataSkipping.readWhere(spark, root, "y", 0L, 7L)
      .select("k", "x", "y").as[(Long, Long, Long)].collect().toSet ===
      pre.filter(_._3 <= 7L))
    // the CONJUNCTION is where z-order shines: the query box x,y∈[0,7]²
    // intersects ~1 of the ~16 z-squares, not a whole slab
    val box = DataSkipping.readWhereAll(spark, root,
      Seq(("x", 0L, 7L), ("y", 0L, 7L)))
    assert(box.select("k", "x", "y").as[(Long, Long, Long)].collect().toSet ===
      pre.filter(r => r._2 <= 7L && r._3 <= 7L))
    val fbox = box.inputFiles.length
    assert(fbox <= math.min(fx, fy) && fbox <= after / 4,
      s"box probe scanned $fbox of $after files (slabs: x=$fx y=$fy)")
  }

  test("rank-based z-order clusters skewed dimensions that defeat linear scaling") {
    import spark.implicits._
    import graft.sources.{AtomicCommit, DataSkipping}
    // x heavy-tailed: 15 of 16 rows dense in [0,63], the rest ~1e9
    // outliers; y uniform. Linear min/max scaling maps every dense x to
    // bucket 0 (the range is 1e9 wide), so the z-curve degenerates to
    // y-only order and an x-slab probe scans everything.
    val data = (0 until 4096).map { i =>
      val x = if (i % 16 == 15) 1000000000L + i else (i / 16) % 64
      (i.toLong, "A", x, (i % 64).toLong)
    }
    def build(rank: Boolean): String = {
      val root = java.nio.file.Files.createTempDirectory(
        s"graft_ac_zrank$rank").toString
      DataSkipping.commitWithStats(spark, root,
        data.toDF("k", "flag", "x", "y"), "flag", Seq("x", "y"))
      Compaction.reclusterZorder(spark, root, Seq("x", "y"),
        filesPerDir = 16, rankBased = rank)
      root
    }
    val linRoot = build(rank = false)
    val rnkRoot = build(rank = true)
    def probe(root: String): (Int, Set[Long]) = {
      val got = DataSkipping.readWhere(spark, root, "x", 0L, 3L)
      (got.inputFiles.length,
        got.select("k").as[Long].collect().toSet)
    }
    val (linFiles, linRows) = probe(linRoot)
    val (rnkFiles, rnkRows) = probe(rnkRoot)
    val expected = data.filter(r => r._3 <= 3L).map(_._1).toSet
    assert(linRows === expected && rnkRows === expected)
    val total = Compaction.countAtomicDataFiles(rnkRoot)
    assert(rnkFiles < linFiles,
      s"rank-based should out-prune linear on skewed x: $rnkFiles vs $linFiles")
    assert(rnkFiles <= total / 2,
      s"rank-based x-slab scanned $rnkFiles of $total files")
  }

  test("recluster bloomCols: point probes on a NON-sort column prune files the sort can't") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_comp_bloom").toString
    // sort by k; id is a distinct key INTERLEAVED across the sorted
    // layout — per-file min/max on id admit every file, only a per-file
    // bloom can tell them apart
    val rows = (0L until 4000L).map(i => (i % 40, i * 1000L + 7L, "A"))
    DataSkipping.commitWithStats(spark, root, rows.toDF("k", "id", "p"),
      "p", Seq("k"))
    Compaction.recluster(spark, root, Seq("k"), filesPerDir = 4,
      statsCols = Seq("k"), bloomCols = Seq("id"))
    val m = AtomicCommit.readManifest(root).get
    val gen = AtomicCommit.ownersOf(m.entries("A")).head
    val blooms = DataSkipping.readBlooms(root, gen)
    assert(blooms.exists(b => b.col == "id" && b.file.nonEmpty),
      "recluster must write per-file bloom records for bloomCols")
    val probe = DataSkipping.readWhereEq(spark, root, "id", 1234007L)
    assert(probe.count() === 1L)
    val total = {
      val st = Files.walk(Paths.get(root, gen))
      try st.iterator().asScala.count(f => f.toString.endsWith(".parquet"))
      finally st.close()
    }
    assert(total >= 3, s"premise: multi-file layout, got $total")
    assert(probe.inputFiles.length === 1,
      s"the id bloom must prune to 1 of $total files")
  }

  test("purgeVectors rewrites only heavily-vectored partitions, content intact") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_purge").toString
    val df = ((1L to 10L).map(i => (i, "A", i)) ++
      (101L to 120L).map(i => (i, "B", i))).toDF("k", "flag", "v")
    DataSkipping.commitWithStats(spark, root, df, "flag", Seq("v"))
    // A: 5 of 10 rows marked (50%); B: 1 of 20 (5%)
    graft.sources.Deletes.deleteWhereMoR(spark, root, col("k") <= 5L)
    graft.sources.Deletes.deleteWhereMoR(spark, root, col("k") === 101L)
    val before = AtomicCommit.readManifest(root).get.entries
    assert(AtomicCommit.dvOf(before("A")).nonEmpty)
    assert(AtomicCommit.dvOf(before("B")).nonEmpty)

    val purged = graft.sources.Compaction.purgeVectors(spark, root,
      threshold = 0.3, statsCols = Seq("v"))
    assert(purged === Seq("A"), "only A crosses the 30% threshold")
    val after = AtomicCommit.readManifest(root).get.entries
    assert(AtomicCommit.dvOf(after("A")).isEmpty, "A's vector folded away")
    assert(after("B") === before("B"), "B untouched — its vector stays")
    // content identical before/after the purge, both vectors respected
    val ks = AtomicCommit.read(spark, root)
      .select("k").as[Long].collect().toSet
    assert(ks === ((6L to 10L) ++ (102L to 120L)).toSet)
    // the purge restored A's metadata-count fast path; B still scans
    assert(DataSkipping.countWhere(spark, root, "v", 1L, 200L) === 24L)
  }

  test("a full compaction DROPS a partition deletes fully emptied") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_cmp_empty").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "A"), (3L, "B")).toDF("k", "p"), "p")
    // the ZERO-SCAN equality delete empties A without knowing it did —
    // the entry keeps its vector (no read happened to prove emptiness)
    graft.sources.Deletes.deleteKeysMoR(spark, root, "k", Seq(1L, 2L))
    val mid = AtomicCommit.readManifest(root).get
    assert(mid.entries.contains("A") && AtomicCommit.dvOf(mid.entries("A")).nonEmpty)

    Compaction.compactAtomicTable(spark, root)
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.keySet === Set("B"),
      s"the emptied partition must fold OUT of a full compaction: ${m.entries}")
    assert(m.entries.values.forall(e => AtomicCommit.dvOf(e).isEmpty))
    assert(AtomicCommit.read(spark, root).select("k").as[Long]
      .collect().toSeq === Seq(3L))
  }

  test("purgeVectors: equality-only vectors select by physical − live, no crash") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_purge_eq").toString
    val df = ((1L to 10L).map(i => (i, "A")) ++
      (101L to 110L).map(i => (i, "B"))).toDF("k", "p")
    DataSkipping.commitWithStats(spark, root, df, "p", Seq("k"))
    // the equality delete's vector generation carries NO position parquet
    graft.sources.Deletes.deleteKeysMoR(spark, root, "k", (1L to 9L))
    val purged = Compaction.purgeVectors(spark, root, threshold = 0.5)
    assert(purged === Seq("A"), "9 of A's 10 rows are gone — provable " +
      "from the stats sidecars' physical counts minus the live scan")
    val after = AtomicCommit.readManifest(root).get.entries
    assert(AtomicCommit.dvOf(after("A")).isEmpty, "A's vector folded away")
    // B keeps its NO-OP vector: the zero-scan delete could not prove B
    // holds none of the keys (no blooms), and B's physical − live = 0
    // keeps it under every threshold — correctly never rewritten
    assert(AtomicCommit.dvOf(after("B")).nonEmpty)
    assert(AtomicCommit.read(spark, root).select("k").as[Long].collect().toSet
      === (Set(10L) ++ (101L to 110L)))
  }

  test("purgeVectors: every selected partition dead → the purge is a drop-only commit") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_purge_dead").toString
    DataSkipping.commitWithStats(spark, root,
      ((1L to 4L).map(i => (i, "A")) ++ (11L to 14L).map(i => (i, "B")))
        .toDF("k", "p"), "p", Seq("k"))
    graft.sources.Deletes.deleteKeysMoR(spark, root, "k", (1L to 4L))
    // the zero-scan delete marks B too (no blooms to prove absence) —
    // capture B's entry as the DELETE left it
    val bBefore = AtomicCommit.readManifest(root).get.entries("B")
    val purged = Compaction.purgeVectors(spark, root, threshold = 0.5)
    assert(purged === Seq("A"))
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.keySet === Set("B"), "the dead partition drops outright")
    assert(m.entries("B") === bBefore, "B's entry untouched by the drop")
    assert(AtomicCommit.read(spark, root).select("k").as[Long].collect().toSet
      === (11L to 14L).toSet)
  }

  test("purgeVectors reaches ESCAPED partition names (raw entry keys vs decoded vectors)") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_purge_esc").toString
    // no stats annotation → selection must come from the POSITION
    // parquet, whose __dv_partition values are decoded ('a/b'), while
    // the manifest entry is the raw dir name ('a%2Fb')
    AtomicCommit.commitReplacePartitions(spark, root,
      ((1L to 4L).map(i => (i, "a/b")) ++ (11L to 14L).map(i => (i, "ok")))
        .toDF("k", "p"), "p")
    graft.sources.Deletes.deleteWhereMoR(spark, root, col("k") <= 3L)
    val entries = AtomicCommit.readManifest(root).get.entries
    assert(entries.contains("a%2Fb") &&
      AtomicCommit.dvOf(entries("a%2Fb")).nonEmpty)
    val purged = Compaction.purgeVectors(spark, root, threshold = 0.5)
    assert(purged === Seq("a%2Fb"),
      "3 of 4 rows marked — the decoded-probe mapping must find them")
    val after = AtomicCommit.readManifest(root).get.entries
    assert(AtomicCommit.dvOf(after("a%2Fb")).isEmpty)
    assert(AtomicCommit.read(spark, root).filter(col("p") === "a/b")
      .select("k").as[Long].collect().toSeq === Seq(4L))
  }
}
