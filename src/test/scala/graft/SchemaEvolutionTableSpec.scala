package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Compaction, Deletes}

/** SCHEMA EVOLUTION on manifest tables — the add-column story, which the
  * generation model gives structurally: each generation's footers own its
  * schema ([[AtomicCommit.readVerbatim]] probes per generation), and
  * [[AtomicCommit.scanManifest]] unions generations BY NAME with missing
  * columns as nulls. So an append carrying a new column widens the table
  * in one ordinary commit: old generations read the column as null
  * (exactly Iceberg/Delta add-column semantics — no backfill, no
  * rewrite), and any rewrite that scans through the merged view
  * (compaction, upsert, CoW delete) physically unifies what it touches.
  * This spec pins that contract, including its interaction with
  * merge-on-read deletes and time travel.
  */
class SchemaEvolutionTableSpec extends SparkSpec {
  import spark.implicits._

  test("appending a new column widens the table; old generations read null") {
    val root = Files.createTempDirectory("graft_evo").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("k", "flag", "v"), "flag")
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "A", 30L, "en"), (4L, "C", 40L, "de"))
        .toDF("k", "flag", "v", "lang"), "flag")
    val df = AtomicCommit.read(spark, root)
    assert(df.columns.toSet === Set("k", "flag", "v", "lang"))
    val rows = df.select("k", "lang").as[(Long, Option[String])]
      .collect().toMap
    assert(rows === Map(1L -> None, 2L -> None,
      3L -> Some("en"), 4L -> Some("de")))
    // time travel: the pre-evolution snapshot keeps the NARROW schema
    assert(AtomicCommit.readAt(spark, root, 1L).columns.toSet ===
      Set("k", "flag", "v"))
  }

  test("evolution composes with MoR deletes, and rewrites physically unify") {
    val root = Files.createTempDirectory("graft_evo2").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      (1L to 10L).map(k => (k, "A", k * 10)).toDF("k", "flag", "v"), "flag")
    AtomicCommit.commitAppendPartitions(spark, root,
      (11L to 20L).map(k => (k, "A", k * 10, s"u$k"))
        .toDF("k", "flag", "v", "owner"), "flag")
    // a vector over the mixed-schema partition: positions address each
    // generation's own files, so the merge is schema-oblivious
    Deletes.deleteWhereMoR(spark, root, col("k").isin(3L, 13L))
    val merged = AtomicCommit.read(spark, root)
    assert(merged.count() === 18L)
    assert(merged.filter(col("k").isin(3L, 13L)).count() === 0L)
    // compaction scans the merged view → ONE generation, unified schema,
    // vector purged, nulls materialized for pre-evolution rows
    Compaction.compactAtomicTable(spark, root)
    val m = AtomicCommit.readManifest(root).get
    assert(AtomicCommit.ownersOf(m.entries("A")).size === 1)
    assert(AtomicCommit.dvOf(m.entries("A")).isEmpty)
    val after = AtomicCommit.read(spark, root)
    assert(after.columns.toSet === Set("k", "flag", "v", "owner"))
    assert(after.count() === 18L)
    assert(after.filter(col("owner").isNull).count() === 9L)
  }

  test("type widening: int→long via SQL, time travel keeps old types, narrowing fails") {
    import org.apache.spark.sql.types.{IntegerType, LongType}
    val root = Files.createTempDirectory("graft_evo_widen").toString
    // v is INT in the footers
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10, "A"), (2L, 20, "B")).toDF("k", "v", "p"), "p")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.wd", root)
    try {
      assert(AtomicCommit.read(spark, root).schema("v").dataType === IntegerType)
      spark.sql("ALTER TABLE graft.wd ALTER COLUMN v TYPE BIGINT")
      // one metadata commit; every face reads LONG, values intact
      val df = AtomicCommit.read(spark, root)
      assert(df.schema("v").dataType === LongType)
      assert(df.select("k", "v").as[(Long, Long)].collect().toMap
        === Map(1L -> 10L, 2L -> 20L))
      assert(spark.sql("SELECT v FROM graft.wd WHERE k = 1").schema("v")
        .dataType === LongType)
      // inserts after the widen land wide — including values an INT
      // cannot hold
      spark.sql("INSERT INTO graft.wd VALUES (3, 6000000000, 'A')")
      assert(spark.sql("SELECT v FROM graft.wd WHERE k = 3")
        .as[Long].head() === 6000000000L)
      // time travel BEFORE the widen still types as the era wrote it
      val old = spark.read.format("graft").option("path", root)
        .option("versionAsOf", "1").load()
      assert(old.schema("v").dataType === IntegerType)
      assert(old.count() === 2L)
      // a rewrite heals the narrow generation physically; the recorded
      // cast self-eliminates but the logical face is unchanged
      Compaction.compactAtomicTable(spark, root)
      val healed = AtomicCommit.read(spark, root)
      assert(healed.schema("v").dataType === LongType)
      assert(healed.count() === 3L)
      // narrowing fails loudly — Spark's analyzer itself rejects
      // non-up-casts before the catalog sees them
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.wd ALTER COLUMN v TYPE INT")
      }.getMessage.contains("NOT_SUPPORTED_CHANGE_COLUMN"))
      // long→string IS a Spark up-cast, so it reaches the engine — which
      // rejects cross-family retypes as lossy-for-this-format
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.wd ALTER COLUMN v TYPE STRING")
      }.getMessage.contains("lossless"))
      // Scala-API narrowing gets the engine's own rejection
      assert(intercept[Exception] {
        AtomicCommit.widenColumn(spark, root,
          new graft.sources.PosixManifestStore(root), "v",
          org.apache.spark.sql.types.IntegerType)
      }.getMessage.contains("lossless"))
      // the partition column guard (its rendered values are directory
      // names) — via the Scala API; SQL's analyzer already screens the
      // string→bigint shape as a non-up-cast
      assert(intercept[Exception] {
        AtomicCommit.widenColumn(spark, root,
          new graft.sources.PosixManifestStore(root), "p",
          org.apache.spark.sql.types.LongType)
      }.getMessage.contains("partition column"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.wd")
    }
  }

  test("type widening follows renames, leaves with drops, and races appends safely") {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    import graft.sources.PosixManifestStore
    val root = Files.createTempDirectory("graft_evo_widenrace").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 1.5f, 10, "A")).toDF("k", "f", "v", "p"), "p")
    AtomicCommit.widenColumn(spark, root, store, "f", DoubleType)
    // rename REKEYS the widening entry; the cast keeps applying
    AtomicCommit.renameColumn(spark, root, store, "f", "score")
    val m1 = AtomicCommit.readManifest(store).get
    assert(AtomicCommit.widenedOf(m1) === Seq("score" -> DoubleType))
    assert(AtomicCommit.read(spark, root).schema("score").dataType
      === DoubleType)
    // drop REMOVES the entry with the column
    AtomicCommit.dropColumn(spark, root, store, "score")
    assert(AtomicCommit.widenedOf(AtomicCommit.readManifest(store).get)
      .isEmpty)
    // widen-vs-append race: concurrent appends (new INT generations) and
    // a widen commit, both CAS-retried — every row must read LONG after
    val appends = (1 to 4).map { i =>
      new Thread(() => AtomicCommit.commitAppendPartitions(spark, root,
        Seq((100L + i, 1.0f, i, "A")).toDF("k", "f2", "v", "p")
          .drop("f2"), "p", 1))
    }
    appends.foreach(_.start())
    AtomicCommit.widenColumn(spark, root, store, "v", LongType)
    appends.foreach(_.join())
    val end = AtomicCommit.read(spark, root)
    assert(end.schema("v").dataType === LongType)
    assert(end.select("v").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L, 3L, 4L, 10L))
  }
}
