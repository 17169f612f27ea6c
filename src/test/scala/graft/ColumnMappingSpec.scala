package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes, PosixManifestStore}

/** Rename-forward column mapping ([[AtomicCommit.renameColumn]] /
  * [[AtomicCommit.dropColumn]], SQL-faced as `ALTER TABLE ... RENAME /
  * DROP COLUMN`): metadata-only commits where old generations keep their
  * physical names, every reader applies the rename chain per generation
  * BEFORE the cross-generation union, and rewrites emit the new name so
  * the physical layout heals toward the logical schema instead of
  * carrying a Delta-style indirection forever. Zero data I/O at DDL
  * time — the 100 TB cost of a rename is one manifest object.
  */
class ColumnMappingSpec extends SparkSpec {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.graft.table.$name", root)
  }

  private def unregister(name: String): Unit = {
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.unset(s"spark.graft.table.$name")
  }

  test("RENAME COLUMN: metadata-only, old generations read under the new name") {
    val root = Files.createTempDirectory("graft_cm_ren").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    register("cm", root)
    try {
      val v0 = AtomicCommit.currentVersion(root).get
      spark.sql("ALTER TABLE graft.cm RENAME COLUMN v TO score")
      // one METADATA commit — no generation changed, no byte rewritten
      val m1 = AtomicCommit.readManifest(root).get
      assert(m1.version === v0 + 1)
      assert(AtomicCommit.history(root).last.kind === "metadata")
      // the logical schema renames; the old generation's rows read under
      // the new name, and a filter on it reaches old-named data
      assert(spark.table("graft.cm").schema.fieldNames.toSeq
        === Seq("k", "score", "p"))
      assert(spark.sql("SELECT k FROM graft.cm WHERE score = 20")
        .as[Long].collect().toSeq === Seq(2L))
      // the ON-DISK footer still carries the OLD name (nothing moved) …
      val gen = AtomicCommit.ownersOf(m1.entries("A")).head
      assert(spark.read.parquet(s"$root/$gen/p=A").columns.contains("v"))
      // … and new writes carry the NEW name physically; mixed gens union
      spark.sql("INSERT INTO graft.cm VALUES (3, 30, 'A')")
      assert(spark.sql("SELECT k, score FROM graft.cm ORDER BY k")
        .as[(Long, Long)].collect().toSeq
        === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      // time travel renders each version under ITS OWN schema
      assert(spark.sql(s"SELECT * FROM graft.cm VERSION AS OF $v0")
        .schema.fieldNames.toSeq === Seq("k", "v", "p"))
      // Scala-API snapshot reads share the logical view
      assert(AtomicCommit.read(spark, root).columns.toSeq
        === Seq("k", "score", "p"))
    } finally unregister("cm")
  }

  test("deletes on renamed tables: positions, equality records, chain translation") {
    val root = Files.createTempDirectory("graft_cm_del").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "B"))
        .toDF("k", "v", "p"), "p")
    register("cd", root)
    try {
      // an equality delete recorded BEFORE the rename (col name "k" at
      // delete time) keeps applying after it — the evidence follows the
      // chain forward
      spark.sql("DELETE FROM graft.cd WHERE k = 1")
      spark.sql("ALTER TABLE graft.cd RENAME COLUMN k TO id")
      assert(spark.sql("SELECT id FROM graft.cd ORDER BY id")
        .as[Long].collect().toSeq === Seq(2L, 3L))
      // a positional MoR delete whose predicate speaks the NEW name
      // resolves against old-named generations (the logical view runs
      // before the _metadata address columns)
      Deletes.deleteWhereMoR(spark, root, col("id") === 3L)
      assert(spark.sql("SELECT id FROM graft.cd").as[Long].collect().toSeq
        === Seq(2L))
      // the zero-scan equality path probes old-named footers through the
      // chain too (id physically lives as k in every current generation)
      spark.sql("DELETE FROM graft.cd WHERE id = 2")
      assert(spark.sql("SELECT count(*) FROM graft.cd").as[Long].head() === 0L
        || !AtomicCommit.readManifest(root).get.entries.contains("A"))
    } finally unregister("cd")
  }

  test("rewrites heal the physical names; ANALYZE restores pruning evidence") {
    val root = Files.createTempDirectory("graft_cm_heal").toString
    DataSkipping.commitWithStats(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p", Seq("v"))
    register("ch", root)
    try {
      spark.sql("ALTER TABLE graft.ch RENAME COLUMN v TO score")
      // pre-rename sidecars are keyed by the write-time name: pruning by
      // the new name finds no evidence and soundly keeps everything
      val m1 = AtomicCommit.readManifest(root).get
      assert(graft.sources.TableStats
        .columnStats(root, m1, "score", m1.entries.keySet).isEmpty)
      // UPDATE rewrites its partition with the NEW physical name
      spark.sql("UPDATE graft.ch SET score = 11 WHERE k = 1")
      val m2 = AtomicCommit.readManifest(root).get
      val genA = AtomicCommit.ownersOf(m2.entries("A")).head
      assert(spark.read.parquet(s"$root/$genA/p=A").columns.contains("score"),
        "the rewritten partition physically carries the new name")
      // ANALYZE records evidence under CURRENT names for both eras
      spark.sql("ANALYZE TABLE graft.ch COMPUTE STATISTICS FOR COLUMNS score")
      val m3 = AtomicCommit.readManifest(root).get
      val cs = graft.sources.TableStats
        .columnStats(root, m3, "score", m3.entries.keySet)
      assert(cs.exists(s => s.rows == 2L && s.numMax.exists(_.intValue == 20)))
      // the change feed emits current names whatever the generation has
      spark.sql("INSERT INTO graft.ch VALUES (9, 90, 'B')")
      val feed = graft.streaming.ChangeFeed.appendsAt(spark, root,
        new PosixManifestStore(root), m3.version + 1)
      assert(feed.exists(_.columns.contains("score")))
    } finally unregister("ch")
  }

  test("DROP COLUMN: logical removal, bytes stay, recycled names rejected") {
    val root = Files.createTempDirectory("graft_cm_drop").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "x", "A"), (2L, 20L, "y", "B"))
        .toDF("k", "v", "tag", "p"), "p")
    register("cp", root)
    try {
      spark.sql("ALTER TABLE graft.cp DROP COLUMN tag")
      assert(AtomicCommit.history(root).last.kind === "metadata")
      assert(spark.table("graft.cp").schema.fieldNames.toSeq
        === Seq("k", "v", "p"))
      // the bytes remain in the old generation until it rewrites
      val m = AtomicCommit.readManifest(root).get
      val gen = AtomicCommit.ownersOf(m.entries("A")).head
      assert(spark.read.parquet(s"$root/$gen/p=A").columns.contains("tag"))
      // new writes simply lack the column
      spark.sql("INSERT INTO graft.cp VALUES (3, 30, 'A')")
      assert(spark.sql("SELECT k FROM graft.cp ORDER BY k")
        .as[Long].collect().toSeq === Seq(1L, 2L, 3L))
      // name recycling is rejected across ALL verbs: re-ADD a dropped
      // name, rename TO a dropped name, rename TO a chain-historic name
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.cp ADD COLUMN tag STRING")
      }.getMessage.contains("DROPPED"))
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.cp RENAME COLUMN v TO tag")
      }.getMessage.contains("DROPPED"))
      spark.sql("ALTER TABLE graft.cp RENAME COLUMN v TO w")
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.cp RENAME COLUMN w TO v")
      }.getMessage.contains("rename history"))
      // layout-bearing columns keep their names
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.cp RENAME COLUMN p TO q")
      }.getMessage.contains("partition column"))
      assert(intercept[Exception] {
        spark.sql("ALTER TABLE graft.cp DROP COLUMN p")
      }.getMessage.contains("partition column"))
      // an added-only column (no data anywhere) drops by prop rewrite
      spark.sql("ALTER TABLE graft.cp ADD COLUMN note STRING")
      spark.sql("ALTER TABLE graft.cp DROP COLUMN note")
      assert(spark.table("graft.cp").schema.fieldNames.toSeq
        === Seq("k", "w", "p"))
      // OPTIMIZE rewrites through the logical view, so it PURGES dropped
      // bytes and heals renamed names physically — REORG PURGE for free
      spark.sql("OPTIMIZE graft.cp")
      val m2 = AtomicCommit.readManifest(root).get
      val cols2 = AtomicCommit.ownersOf(m2.entries("A"))
        .flatMap(g => spark.read.parquet(s"$root/$g/p=A").columns).toSet
      assert(!cols2.contains("tag"), "dropped bytes must purge on rewrite")
      assert(cols2.contains("w") && !cols2.contains("v"),
        "renamed column must heal to its new physical name on rewrite")
      assert(spark.sql("SELECT k, w FROM graft.cp ORDER BY k")
        .as[(Long, Long)].collect().toSeq
        === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
    } finally unregister("cp")
  }

  test("constraints follow renames and block drops") {
    val root = Files.createTempDirectory("graft_cm_cons").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A")).toDF("k", "v", "p"), "p")
    AtomicCommit.addConstraint(spark, root, "v_pos", "v > 0")
    // the rename REWRITES the rule in the same commit, so enforcement
    // keeps resolving against staged (logical-named) data
    AtomicCommit.renameColumn(spark, root, store, "v", "w")
    assert(AtomicCommit.constraints(root).keySet === Set("v_pos"))
    assert(AtomicCommit.constraints(root)("v_pos").contains("w"))
    intercept[AtomicCommit.ConstraintViolationException] {
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((2L, -5L, "A")).toDF("k", "w", "p"), "p", 1)
    }
    // dropping a constrained column is refused until the rule goes
    assert(intercept[Exception] {
      AtomicCommit.dropColumn(spark, root, store, "w")
    }.getMessage.contains("DROP CONSTRAINT first"))
    AtomicCommit.dropConstraint(root, "v_pos")
    AtomicCommit.dropColumn(spark, root, store, "w")
    assert(AtomicCommit.read(spark, root).columns.toSeq === Seq("k", "p"))
  }

  test("branch merges: one-sided rename translates the other side; divergent DDL aborts") {
    import graft.sources.BranchStore
    val root = Files.createTempDirectory("graft_cm_br").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p", 1)
    // one-sided: branch renames, main commits data under the OLD schema —
    // the merged chain translates main's post-fork rows too
    AtomicCommit.createBranch(root, store, "dev")
    val dev = new BranchStore(store, "dev")
    AtomicCommit.renameColumn(spark, root, dev, "v", "score")
    AtomicCommit.commitAppendPartitions(spark, root, store,
      Seq((3L, 30L, "A")).toDF("k", "v", "p"), "p", 1)
    AtomicCommit.mergeBranch(root, store, "dev")
    val merged = AtomicCommit.read(spark, root, store)
    assert(merged.columns.toSet === Set("k", "score", "p"))
    assert(merged.filter($"k" === 3L).select($"score")
      .as[Long].head() === 30L, "main's post-fork row must translate")
    // divergent: BOTH lineages rename since the fork — no three-way merge
    AtomicCommit.createBranch(root, store, "dev2")
    val dev2 = new BranchStore(store, "dev2")
    AtomicCommit.renameColumn(spark, root, dev2, "k", "id")
    AtomicCommit.renameColumn(spark, root, store, "k", "key")
    val e = intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "dev2")
    }
    assert(e.getMessage.contains("diverged on BOTH"), e.getMessage)
  }

  test("branch merges: cross-KEY schema-DDL collisions abort (rename target vs added column)") {
    import graft.sources.BranchStore
    val root = Files.createTempDirectory("graft_cm_xkey").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p", 1)
    // branch: RENAME v TO b (chain changes one-sided); main: ADD COLUMN b
    // (added set changes one-sided). Each prop KEY merges soundly alone,
    // but the union carries a chain targeting b AND an added column b —
    // a recycling no single lineage's DDL validation would admit.
    AtomicCommit.createBranch(root, store, "ddl")
    val ddl = new BranchStore(store, "ddl")
    AtomicCommit.renameColumn(spark, root, ddl, "v", "b")
    AtomicCommit.addColumnsAtomic(spark, root, store,
      org.apache.spark.sql.types.StructType.fromDDL("b BIGINT"))
    val e = intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "ddl")
    }
    assert(e.getMessage.contains("recycles a column name"), e.getMessage)
    // the reverse composition (branch adds, main renames to the same
    // name) collides identically
    AtomicCommit.dropBranch(store, "ddl")
    AtomicCommit.createBranch(root, store, "ddl2")
    val ddl2 = new BranchStore(store, "ddl2")
    AtomicCommit.addColumnsAtomic(spark, root, ddl2,
      org.apache.spark.sql.types.StructType.fromDDL("c BIGINT"))
    AtomicCommit.renameColumn(spark, root, store, "v", "c")
    val e2 = intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.mergeBranch(root, store, "ddl2")
    }
    assert(e2.getMessage.contains("recycles a column name"), e2.getMessage)
    // a NON-colliding cross-key composition still merges: branch adds x,
    // main renames v→w — disjoint names, both DDLs survive the merge
    AtomicCommit.dropBranch(store, "ddl2")
    AtomicCommit.createBranch(root, store, "ok")
    val ok = new BranchStore(store, "ok")
    AtomicCommit.addColumnsAtomic(spark, root, ok,
      org.apache.spark.sql.types.StructType.fromDDL("x BIGINT"))
    AtomicCommit.renameColumn(spark, root, store, "c", "w")
    AtomicCommit.mergeBranch(root, store, "ok")
    // k,v→w from footers; b survives from scenario 1's main ADD; x from
    // the merged branch ADD
    assert(AtomicCommit.read(spark, root, store).columns.toSet
      === Set("k", "w", "b", "x", "p"))
  }

  test("constraints resolve case-insensitively across rename/drop DDL") {
    val root = Files.createTempDirectory("graft_cm_ci").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A")).toDF("k", "v", "p"), "p")
    // Spark resolves CHECK predicates case-insensitively by default, so
    // a rule spelled `V > 0` binds column v — rename/drop DDL must see
    // the reference under the same rules or the rename strands an
    // unresolvable rule that fails every later commit
    AtomicCommit.addConstraint(spark, root, "v_pos", "V > 0")
    AtomicCommit.renameColumn(spark, root, store, "v", "w")
    assert(AtomicCommit.constraints(root)("v_pos").contains("w"),
      AtomicCommit.constraints(root).toString)
    intercept[AtomicCommit.ConstraintViolationException] {
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((2L, -5L, "A")).toDF("k", "w", "p"), "p", 1)
    }
    // drop-guard sees the mixed-case reference too
    AtomicCommit.addConstraint(spark, root, "w_cap", "W < 100")
    assert(intercept[Exception] {
      AtomicCommit.dropColumn(spark, root, store, "w")
    }.getMessage.contains("DROP CONSTRAINT first"))
  }

  test("chained renames resolve every era; MERGE works across the chain") {
    val root = Files.createTempDirectory("graft_cm_chain").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A")).toDF("k", "v", "p"), "p")
    register("cc", root)
    try {
      spark.sql("ALTER TABLE graft.cc RENAME COLUMN v TO v2") // era 1 data
      spark.sql("INSERT INTO graft.cc VALUES (2, 20, 'A')")   // era 2 data
      spark.sql("ALTER TABLE graft.cc RENAME COLUMN v2 TO v3")
      spark.sql("INSERT INTO graft.cc VALUES (3, 30, 'B')")   // era 3 data
      assert(spark.sql("SELECT k, v3 FROM graft.cc ORDER BY k")
        .as[(Long, Long)].collect().toSeq
        === Seq((1L, 10L), (2L, 20L), (3L, 30L)))
      // MERGE through the SQL lowering touches all three eras
      spark.sql(
        """MERGE INTO graft.cc t USING (SELECT 1 AS k, 99 AS nv) s
          |ON t.k = s.k WHEN MATCHED THEN UPDATE SET v3 = s.nv""".stripMargin)
      assert(spark.sql("SELECT v3 FROM graft.cc WHERE k = 1")
        .as[Long].head() === 99L)
    } finally unregister("cc")
  }
}
