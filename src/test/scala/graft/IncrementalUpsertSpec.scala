package graft

import java.nio.file.{Files, Paths}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import graft.sources.IncrementalUpsert

/** Partition-pruned MERGE (q140's engine): correctness of the row-level
  * upsert, and the two scale properties that make it incremental — the
  * base scan prunes to touched partitions, and untouched partition
  * directories are not rewritten on disk.
  */
class IncrementalUpsertSpec extends SparkSpec {

  private val cols = Seq("doc_id", "text", "lang", "source", "n_chars")

  private def dirState(dir: String): Map[String, Seq[String]] = {
    val root = Paths.get(dir)
    Files.list(root).iterator().asScala
      .filter(p => Files.isDirectory(p) && p.getFileName.toString.startsWith("lang="))
      .map { p =>
        p.getFileName.toString ->
          Files.list(p).iterator().asScala.map(_.getFileName.toString).toSeq.sorted
      }.toMap
  }

  test("mergeIntoSnapshot merges rows correctly and rewrites only touched partitions") {
    val dir = Scratch.ephemeral("graft_upsert_spec")
    val docs = Tables.documents(spark, sf0001).select(cols.map(col): _*)
    docs.repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val before = dirState(dir)
    assert(before.keySet === Set("lang=de", "lang=en", "lang=es", "lang=fr", "lang=zh"))

    // changes confined to lang=de: row-replacing updates + fresh inserts
    val updates = docs.filter(col("lang") === "de" && col("doc_id") % 5 === 0)
      .withColumn("n_chars", col("n_chars") + 1000L)
      .select(cols.map(col): _*)
    val inserts = docs.filter(col("lang") === "de" && col("doc_id") % 11 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), lit("ins").as("text"),
        col("lang"), lit("ingest").as("source"), lit(42L).as("n_chars"))
    val touched = IncrementalUpsert.mergeIntoSnapshot(
      spark, dir, updates.union(inserts), "lang", "doc_id")
    assert(touched === Seq("de"))

    val after = dirState(dir)
    // untouched partitions: identical file listings (a rewrite always
    // produces fresh part-file names, so listing equality pins "not
    // rewritten"); the touched partition must have new files
    for (lang <- Seq("lang=en", "lang=es", "lang=fr", "lang=zh"))
      assert(after(lang) === before(lang), s"$lang was rewritten")
    assert(after("lang=de") !== before("lang=de"), "lang=de should be rewritten")

    // content: change rows replace base rows by key; everything else intact
    val expected = docs.filter(!(col("lang") === "de" && col("doc_id") % 5 === 0))
      .select(cols.map(col): _*)
      .union(updates).union(inserts)
      .collect().map(_.toSeq).toSet
    val got = spark.read.parquet(dir).select(cols.map(col): _*)
      .collect().map(_.toSeq).toSet
    assert(got === expected)

    // empty change set: zero partitions rewritten, snapshot untouched
    assert(IncrementalUpsert.mergeIntoSnapshot(
      spark, dir, updates.filter(lit(false)), "lang", "doc_id") === Nil)
    assert(dirState(dir) === after)
  }

  test("numeric-like partition values round-trip verbatim; null partition values are rejected") {
    val s = spark
    import s.implicits._
    val dir = Scratch.ephemeral("graft_upsert_infer")
    // month=01: type inference would read this as int 1 and rewrite a
    // RENAMED month=1 directory beside the original (the Compaction bug
    // class) — the merge must preserve the verbatim value
    Seq((1L, "01", 10L), (2L, "01", 20L), (3L, "02", 30L))
      .toDF("id", "month", "v")
      .repartition(col("month"))
      .write.mode("overwrite").partitionBy("month").parquet(dir)
    val changes = Seq((2L, "01", 99L)).toDF("id", "month", "v")
    val touched = sources.IncrementalUpsert.mergeIntoSnapshot(
      spark, dir, changes, "month", "id")
    assert(touched === Seq("01"))
    val dirs = java.nio.file.Files.list(java.nio.file.Paths.get(dir))
      .iterator().asScala.map(_.getFileName.toString)
      .filter(_.startsWith("month=")).toSeq.sorted
    assert(dirs === Seq("month=01", "month=02"), s"partition dirs renamed: $dirs")
    val got = spark.read.option("basePath", dir).parquet(dir)
      .select("id", "v").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got === Set((1L, 10L), (2L, 99L), (3L, 30L)))

    // null partition value: loud rejection, not a silent duplicate-insert
    val nullChange = Seq((9L, null.asInstanceOf[String], 1L)).toDF("id", "month", "v")
    val e = intercept[IllegalArgumentException] {
      sources.IncrementalUpsert.mergeIntoSnapshot(spark, dir, nullChange, "month", "id")
    }
    assert(e.getMessage.contains("NULL"))
  }

  test("the pruned base read carries the touched set as a partition filter") {
    val dir = Scratch.ephemeral("graft_upsert_prune")
    Tables.documents(spark, sf0001).select(cols.map(col): _*)
      .repartition(col("lang"))
      .write.mode("overwrite").partitionBy("lang").parquet(dir)
    val p = IncrementalUpsert.prunedBase(spark, dir, "lang", Seq("de", "fr"))
      .queryExecution.executedPlan.toString
    // the isin must land in PartitionFilters (directory pruning), not as a
    // post-scan data filter over all partitions
    assert("PartitionFilters: \\[[^\\]]*lang[^\\]]*".r.findFirstIn(p).nonEmpty, p)
  }

  test("mergeIntoAtomicSnapshot: pruned merge + atomic publish, untouched generation untouched") {
    import spark.implicits._
    import graft.sources.AtomicCommit
    val root = Files.createTempDirectory("graft_upsert_ac").toString
    val base = Seq(
      (1L, "alpha", "de", "web", 10L), (2L, "beta", "de", "web", 20L),
      (3L, "gamma", "fr", "web", 30L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    AtomicCommit.commitReplacePartitions(spark, root, base, "lang")
    val frGenBefore = AtomicCommit.readManifest(root).get.entries("fr")
    // update doc 2, insert doc 9 — touches ONLY lang=de
    val changes = Seq(
      (2L, "beta2", "de", "web", 21L), (9L, "new", "de", "ingest", 42L))
      .toDF("doc_id", "text", "lang", "source", "n_chars")
    val touched = IncrementalUpsert.mergeIntoAtomicSnapshot(
      spark, root, changes, "lang", "doc_id")
    assert(touched === Seq("de"))
    val after = AtomicCommit.read(spark, root)
      .select("doc_id", "text", "n_chars").as[(Long, String, Long)]
      .collect().sortBy(_._1)
    assert(after === Array(
      (1L, "alpha", 10L), (2L, "beta2", 21L), (3L, "gamma", 30L), (9L, "new", 42L)))
    // the untouched fr partition still points at its ORIGINAL generation —
    // the merge never read, listed, or rewrote it
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries("fr") === frGenBefore)
    assert(m.entries("de") !== frGenBefore)
    // all-new partition: merge with no base to read
    val t2 = IncrementalUpsert.mergeIntoAtomicSnapshot(
      spark, root,
      Seq((50L, "nuevo", "es", "web", 5L)).toDF("doc_id", "text", "lang", "source", "n_chars"),
      "lang", "doc_id")
    assert(t2 === Seq("es"))
    assert(AtomicCommit.read(spark, root).count() === 5L)
  }
}
