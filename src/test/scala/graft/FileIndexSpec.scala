package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping}

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
}
