package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Merge}

/** [[graft.sources.Merge]] — ANSI MERGE INTO over manifest tables:
  * clause-cascade semantics (first matching clause per row group),
  * partition-CoW execution (untouched partitions keep their generation),
  * emptied-partition drops, and the ambiguity / partition-move guards.
  */
class MergeSpec extends SparkSpec {
  import spark.implicits._

  private def seed(root: String): Unit =
    AtomicCommit.commitReplacePartitions(spark, root, Seq(
      (1L, 10L, "open", "A"), (2L, 20L, "open", "A"),
      (3L, 30L, "open", "B"), (4L, 40L, "closed", "B"),
      (5L, 50L, "open", "C")).toDF("k", "v", "status", "p"), "p")

  test("upsert: updateAll + insertAll; untouched partitions keep their generation") {
    val root = Files.createTempDirectory("graft_merge1").toString
    seed(root)
    val before = AtomicCommit.readManifest(root).get
    val src = Seq(
      (2L, 21L, "open", "A"),   // update in A
      (6L, 60L, "open", "D"))   // insert into new partition D
      .toDF("k", "v", "status", "p")
    val v = Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedUpdateAll()
      .whenNotMatchedInsertAll()
      .run()
    assert(v === before.version + 1)
    val after = AtomicCommit.readManifest(root).get
    // B and C were never in play: same owner entry, byte for byte
    assert(after.entries("B") === before.entries("B"))
    assert(after.entries("C") === before.entries("C"))
    assert(after.entries("A") !== before.entries("A"))
    assert(after.entries.contains("D"))
    val got = AtomicCommit.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(got === Map(1L -> 10L, 2L -> 21L, 3L -> 30L, 4L -> 40L,
      5L -> 50L, 6L -> 60L))
  }

  test("clause order: first matching clause wins (delete guard before update)") {
    val root = Files.createTempDirectory("graft_merge2").toString
    seed(root)
    val src = Seq(
      (1L, 0L, "del"),   // op=del → delete clause fires first
      (2L, 22L, "upd"),  // op!=del → falls through to updateAll... but
      (3L, 33L, "upd"))  // updateAll needs all target cols; use update(set)
      .toDF("k", "v", "op")
    Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedDelete(col("s.op") === "del")
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .run()
    val got = AtomicCommit.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(got === Map(2L -> 22L, 3L -> 33L, 4L -> 40L, 5L -> 50L))
    // conditional update: only rows passing the condition change
    val src2 = Seq((4L, 41L), (5L, 51L)).toDF("k", "v")
    Merge.into(spark, root).using(src2).onKeys("k")
      .whenMatchedUpdate(col("t.status") === "open", Map("v" -> col("s.v")))
      .run()
    val got2 = AtomicCommit.read(spark, root)
      .select("k", "v").as[(Long, Long)].collect().toMap
    assert(got2 === Map(2L -> 22L, 3L -> 33L, 4L -> 40L, 5L -> 51L),
      "k=4 is closed — its conditional update must not fire")
  }

  test("whenNotMatchedBySource: rows absent from the source age out") {
    val root = Files.createTempDirectory("graft_merge3").toString
    seed(root)
    val src = Seq((1L, 11L), (3L, 31L)).toDF("k", "v")
    Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedUpdate(Map("v" -> col("s.v")))
      .whenNotMatchedBySourceUpdate(col("t.status") === "open",
        Map("status" -> lit("stale")))
      .run()
    val got = AtomicCommit.read(spark, root)
      .select("k", "v", "status").as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got === Map(
      1L -> ((11L, "open")), 2L -> ((20L, "stale")), 3L -> ((31L, "open")),
      4L -> ((40L, "closed")), // closed: by-source condition false → kept
      5L -> ((50L, "stale"))))
    // by-source delete: purge everything the source no longer names
    Merge.into(spark, root).using(src).onKeys("k")
      .whenNotMatchedBySourceDelete()
      .run()
    assert(AtomicCommit.read(spark, root).select("k").as[Long]
      .collect().toSet === Set(1L, 3L))
  }

  test("emptied partition drops from the manifest in the same commit") {
    val root = Files.createTempDirectory("graft_merge4").toString
    seed(root)
    val src = Seq((5L, "del")).toDF("k", "op") // k=5 is partition C's only row
    Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedDelete(col("s.op") === "del")
      .run()
    val m = AtomicCommit.readManifest(root).get
    assert(!m.entries.contains("C"))
    assert(AtomicCommit.read(spark, root).select("k").as[Long]
      .collect().toSet === Set(1L, 2L, 3L, 4L))
  }

  test("no-op merge burns no version; guards fire loudly") {
    val root = Files.createTempDirectory("graft_merge5").toString
    seed(root)
    val v0 = AtomicCommit.readManifest(root).get.version
    // no key matches, no insert clause → nothing to do
    val v = Merge.into(spark, root).using(Seq((99L, 0L)).toDF("k", "v"))
      .onKeys("k").whenMatchedUpdate(Map("v" -> col("s.v"))).run()
    assert(v === v0)
    // duplicate source keys with a matched clause: the ANSI ambiguity error
    val dup = Seq((1L, 1L), (1L, 2L)).toDF("k", "v")
    val e1 = intercept[RuntimeException] {
      Merge.into(spark, root).using(dup).onKeys("k")
        .whenMatchedUpdate(Map("v" -> col("s.v"))).run()
    }
    assert(e1.getMessage.contains("duplicate key"))
    // updating the partition column is a row move — rejected
    val e2 = intercept[RuntimeException] {
      Merge.into(spark, root).using(Seq((1L, "B")).toDF("k", "p"))
        .onKeys("k").whenMatchedUpdate(Map("p" -> col("s.p"))).run()
    }
    assert(e2.getMessage.contains("partition column"))
  }

  test("updateAll keeps the matched row's partition (no silent row moves)") {
    val root = Files.createTempDirectory("graft_merge7").toString
    seed(root)
    // source claims k=1 now belongs to partition B — the update must
    // take v/status from the source but keep the row in A (a move would
    // stage-replace B and clobber rows this merge never read)
    val src = Seq((1L, 111L, "moved?", "B")).toDF("k", "v", "status", "p")
    val before = AtomicCommit.readManifest(root).get
    Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedUpdateAll()
      .run()
    val after = AtomicCommit.readManifest(root).get
    assert(after.entries("B") === before.entries("B"),
      "partition B was never in play")
    val got = AtomicCommit.read(spark, root).where(col("k") === 1L)
      .select("v", "status", "p").as[(Long, String, String)].head()
    assert(got === ((111L, "moved?", "A")))
    assert(AtomicCommit.read(spark, root).count() === 5L)
  }

  test("insert values that REDIRECT the partition price the real destination (no clobber)") {
    val root = Files.createTempDirectory("graft_merge8").toString
    seed(root)
    // source says p='D' but the insert clause routes the row to B — if
    // phase 1 priced src.p instead of the clause's value expression, B
    // would never be read and the staged replace would clobber rows 3,4
    val src = Seq((9L, 90L, "D")).toDF("k", "v", "p")
    Merge.into(spark, root).using(src).onKeys("k")
      .whenNotMatchedInsert(Map("k" -> col("s.k"), "v" -> col("s.v"),
        "status" -> lit("new"), "p" -> lit("B")))
      .run()
    val got = AtomicCommit.read(spark, root)
      .where(col("p") === "B").select("k").as[Long].collect().toSet
    assert(got === Set(3L, 4L, 9L), "pre-existing B rows must survive")
    // and a NULL-partition insert is rejected loudly, not written
    val e = intercept[RuntimeException] {
      Merge.into(spark, root).using(Seq((10L, 100L)).toDF("k", "v"))
        .onKeys("k")
        .whenNotMatchedInsert(Map("k" -> col("s.k"), "v" -> col("s.v")))
        .run()
    }
    assert(e.getMessage.contains("NULL partition"))
  }

  test("insert-only merge with explicit values and condition") {
    val root = Files.createTempDirectory("graft_merge6").toString
    seed(root)
    val src = Seq((2L, 200L, "A"), (7L, 70L, "A"), (8L, -8L, "B"))
      .toDF("k", "v", "p")
    Merge.into(spark, root).using(src).onKeys("k")
      .whenNotMatchedInsert(col("s.v") > 0,
        Map("k" -> col("s.k"), "v" -> col("s.v"),
          "status" -> lit("new"), "p" -> col("s.p")))
      .run()
    val got = AtomicCommit.read(spark, root)
      .select("k", "v", "status").as[(Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got(7L) === ((70L, "new")))
    assert(!got.contains(8L), "insert condition filtered the negative row")
    assert(got(2L) === ((20L, "open")), "matched rows untouched in insert-only merge")
    // and the commit is a pure APPEND (the fast path: no partition was
    // read back or rewritten — owner-list growth only)
    assert(AtomicCommit.history(root).last.kind === "append")
    // nothing new to insert → no version burned
    val v = AtomicCommit.readManifest(root).get.version
    assert(Merge.into(spark, root).using(src).onKeys("k")
      .whenNotMatchedInsert(col("s.v") > 0,
        Map("k" -> col("s.k"), "v" -> col("s.v"),
          "status" -> lit("new"), "p" -> col("s.p"))).run() === v)
  }

  test("updating the hidden-partitioning SOURCE column is rejected (stale derived key)") {
    import graft.sources.{HiddenPartitioning => HP}
    val root = Files.createTempDirectory("graft_merge_hp").toString
    val rows = Seq((1L, "2024-03-01T05:00:00Z"), (2L, "2024-03-02T06:00:00Z"))
      .toDF("k", "iso")
      .select(col("k"), to_timestamp(col("iso")).as("ts"))
    HP.commitReplace(spark, root, rows, HP.Days("ts"))
    val src = Seq((1L, java.sql.Timestamp.from(
      java.time.Instant.parse("2024-05-05T00:00:00Z")))).toDF("k", "ts")
    // explicit SET on the transform source: on a days(ts) table this
    // would leave ts_day stale and every later source-predicate read
    // pruning to the WRONG day
    val e = intercept[RuntimeException] {
      Merge.into(spark, root).using(src).onKeys("k")
        .whenMatchedUpdate(Map("ts" -> col("s.ts"))).run()
    }
    assert(e.getMessage.contains("days(ts)"), e.getMessage)
    // updateAll copies every same-named source column — ts included —
    // so it is rejected on a hidden-partitioned table too
    val e2 = intercept[RuntimeException] {
      Merge.into(spark, root).using(src).onKeys("k")
        .whenMatchedUpdateAll().run()
    }
    assert(e2.getMessage.contains("ts"), e2.getMessage)
    // updates NOT touching the source column still run
    val withV = Seq((1L, 7L)).toDF("k", "v2")
    Merge.into(spark, root).using(withV).onKeys("k")
      .whenMatchedUpdate(Map("k" -> col("t.k"))).run() // no-op set: fine
    assert(AtomicCommit.read(spark, root).count() === 2L)
  }

  test("schema evolution: a source-only column auto-ADDs with the option, is ignored without") {
    val root = Files.createTempDirectory("graft_merge_evo").toString
    seed(root)
    val src = Seq(
      (2L, 21L, "open", "A", "cdc-7"),  // update in A
      (6L, 60L, "open", "D", "cdc-7"))  // insert into new partition D
      .toDF("k", "v", "status", "p", "batch_id")
    // OFF (default): extra source columns are silently dropped from the
    // merged output — the pre-evolution contract
    Merge.into(spark, root).using(src).onKeys("k")
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().run()
    assert(!AtomicCommit.read(spark, root).columns.contains("batch_id"))
    // ON: the column ADDs (one props commit), existing rows backfill
    // NULL, merged rows carry the source's value
    Merge.into(spark, root).using(src).onKeys("k")
      .withSchemaEvolution()
      .whenMatchedUpdateAll().whenNotMatchedInsertAll().run()
    val preEvoVersion = AtomicCommit.readManifest(root).get.version - 2
    val after = AtomicCommit.read(spark, root)
    assert(after.columns.contains("batch_id"))
    val byK = after.select("k", "batch_id")
      .as[(Long, Option[String])].collect().toMap
    assert(byK(2L) === Some("cdc-7") && byK(6L) === Some("cdc-7"))
    assert(byK(1L).isEmpty && byK(3L).isEmpty, "old rows backfill NULL")
    // time travel BEFORE the evolution shows the old schema
    val old = spark.read.format("graft").option("path", root)
      .option("versionAsOf", preEvoVersion.toString).load()
    assert(!old.columns.contains("batch_id"))
    // the session-wide conf is the other switch
    val src2 = src.withColumnRenamed("batch_id", "batch2")
    withSQLConf("spark.graft.merge.schemaEvolution" -> "true") {
      Merge.into(spark, root).using(src2).onKeys("k")
        .whenMatchedUpdateAll().whenNotMatchedInsertAll().run()
    }
    assert(AtomicCommit.read(spark, root).columns.contains("batch2"))
  }

  test("schema evolution matches existing columns case-insensitively (no duplicate-modulo-case ADD)") {
    val root = Files.createTempDirectory("graft_merge_evocase").toString
    seed(root)
    // a CDC batch whose column is spelled `V` against target `v`: under
    // the session's default (case-insensitive) resolution it IS the
    // existing column — evolution must not ADD a second one and make
    // later references to `v` ambiguous
    val src = Seq((2L, 21L, "open", "A")).toDF("k", "V", "status", "p")
    val before = AtomicCommit.read(spark, root).columns.length
    Merge.into(spark, root).using(src).onKeys("k")
      .withSchemaEvolution()
      .whenMatchedUpdateAll().run()
    val after = AtomicCommit.read(spark, root)
    assert(after.columns.length === before,
      s"no column may be added: ${after.columns.mkString(", ")}")
    assert(after.filter($"k" === 2L).select("v").as[Long].head() === 21L)
  }

  test("SQL MERGE WITH SCHEMA EVOLUTION evolves through the catalog's ALTER path") {
    val root = Files.createTempDirectory("graft_merge_evosql").toString
    seed(root)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.me", root)
    try {
      // the star form — Spark's analyzer computes the AddColumn change
      // from the source schema, applies it through THIS catalog's
      // alterTable, reloads the table, and resolves the star over the
      // evolved schema
      spark.sql(
        """MERGE WITH SCHEMA EVOLUTION INTO graft.me t
          |USING (SELECT 2L AS k, 21L AS v, 'open' AS status, 'A' AS p,
          |               99L AS v2) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *""".stripMargin)
      val got = spark.sql("SELECT k, v2 FROM graft.me ORDER BY k")
        .as[(Long, Option[Long])].collect().toSeq
      assert(got === Seq(1L -> None, 2L -> Some(99L), 3L -> None,
        4L -> None, 5L -> None))
      // without the clause, a new column still fails resolution
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO graft.me t USING (SELECT 2 AS k, 1 AS v3) s
            |ON t.k = s.k WHEN MATCHED THEN UPDATE SET v3 = s.v3""".stripMargin)
      }
      assert(e.getMessage.contains("v3"), e.getMessage)
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.me")
    }
  }
}
