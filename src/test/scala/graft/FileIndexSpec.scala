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
}
