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
}
