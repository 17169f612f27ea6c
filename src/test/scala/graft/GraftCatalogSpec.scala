package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Deletes}

/** [[graft.sources.GraftCatalog]] — the DataSourceV2 catalog face:
  * `graft.<name>` resolves through the session-conf registry with the
  * REAL `VERSION AS OF` syntax (number or tag via the DSv2 time-travel
  * loadTable hook), branch addressing, and INSERT INTO / OVERWRITE
  * through the V1 write bridge — all landing on the same [[GraftRelation]]
  * as the view surface (deletion vectors, pruning, constraints included).
  */
class GraftCatalogSpec extends SparkSpec {
  import spark.implicits._

  test("graft.<name>: registry, VERSION AS OF, tags, branches, INSERT, pruning") {
    val root = Files.createTempDirectory("graft_cat").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "A")).toDF("k", "v", "p"), "p")
    AtomicCommit.tag(root, "first", 1L) // v2
    Deletes.deleteWhereMoR(spark, root, col("k") === 2L) // v3
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.docs", root)
    try {
      // current snapshot, vector applied
      assert(spark.sql("SELECT k FROM graft.docs").as[Long]
        .collect().toSet === Set(1L))
      // the REAL time-travel syntax: by number and by tag name
      assert(spark.sql("SELECT count(*) FROM graft.docs VERSION AS OF 1")
        .as[Long].head() === 2L)
      assert(spark.sql("SELECT count(*) FROM graft.docs VERSION AS OF 'first'")
        .as[Long].head() === 2L)
      // branch lineage via name@branch
      AtomicCommit.createBranch(root,
        new graft.sources.PosixManifestStore(root), "dev", None)
      val dev = AtomicCommit.branchStore(
        new graft.sources.PosixManifestStore(root), "dev")
      AtomicCommit.commitAppendPartitions(spark, root, dev,
        Seq((9L, 90L, "A")).toDF("k", "v", "p"), "p", 1)
      assert(spark.sql("SELECT k FROM graft.`docs@dev`").as[Long]
        .collect().toSet === Set(1L, 9L))
      assert(spark.sql("SELECT k FROM graft.docs").as[Long]
        .collect().toSet === Set(1L), "main untouched by the branch")
      // INSERT INTO the catalog name = an append commit
      spark.sql("INSERT INTO graft.docs VALUES (5, 50, 'B')")
      assert(spark.sql("SELECT k FROM graft.docs").as[Long]
        .collect().toSet === Set(1L, 5L))
      assert(AtomicCommit.history(root).last.kind === "append")
      // INSERT OVERWRITE = whole-table replace in one commit
      spark.sql("INSERT OVERWRITE graft.docs VALUES (7, 70, 'A')")
      assert(spark.sql("SELECT k FROM graft.docs").as[Long]
        .collect().toSet === Set(7L))
      assert(AtomicCommit.readManifest(root).get.entries.keySet === Set("A"))
      // filters through the catalog face reach the same buildScan as the
      // view surface (whose manifest-level pruning GraftDataSourceSpec
      // proves by physically removing pruned files — the catalog face
      // re-resolves schema per query, so every generation's FOOTER is
      // probed regardless; scan pruning is what buildScan skips)
      spark.sql("INSERT INTO graft.docs VALUES (8, 80, 'B')")
      assert(spark.sql("SELECT count(*) FROM graft.docs WHERE p = 'A'")
        .as[Long].head() === 1L)
      assert(spark.sql("SELECT k FROM graft.docs WHERE p = 'B'")
        .as[Long].collect().toSet === Set(8L))
      // unregistered names fail loudly (the catalog's NoSuchTable falls
      // through to Spark's direct-query-on-files rejection for the
      // "graft" source — either way, never a silent empty result)
      val ex = intercept[Exception] { spark.sql("SELECT * FROM graft.nope") }
      assert(ex.getMessage.contains("nope") || ex.getMessage.contains("graft"))
    } finally {
      spark.conf.unset("spark.graft.table.docs")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("DELETE FROM graft.<name>: MoR routing, zero-scan equality path, guards") {
    val root = Files.createTempDirectory("graft_cat_del").toString
    val store = new graft.sources.PosixManifestStore(root)
    val staged = AtomicCommit.stage(spark, root, store,
      Seq((1L, 10L, "A"), (2L, 20L, "A"), (3L, 30L, "B"), (4L, 40L, "B"),
        (5L, 50L, "C")).toDF("k", "v", "p"), "p", 1)
    graft.sources.DataSkipping.annotateStagedBloom(spark, root, staged,
      Seq("k"))
    AtomicCommit.publish(root, store, staged)
    AtomicCommit.tag(root, "before", 1L)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.docs", root)
    try {
      // range DELETE → positional MoR (a matching scan, no rewrite): the
      // data generation must keep its files
      val gen0 = AtomicCommit.ownersOf(
        AtomicCommit.readManifest(root).get.entries("A")).head
      spark.sql("DELETE FROM graft.docs WHERE v > 35 AND v < 45")
      assert(spark.sql("SELECT k FROM graft.docs").as[Long]
        .collect().toSet === Set(1L, 2L, 3L, 5L))
      assert(AtomicCommit.history(root).last.kind === "rowdelete")
      assert(AtomicCommit.ownersOf(
        AtomicCommit.readManifest(root).get.entries("B")) === Seq(gen0),
        "MoR: the data generation survives the delete untouched")
      // pre-delete snapshot still reads in full via the tag (checked
      // BEFORE the file-removal proof below mutilates partition C)
      assert(spark.sql(
        "SELECT count(*) FROM graft.docs VERSION AS OF 'before'")
        .as[Long].head() === 5L)
      // key-list DELETE → the ZERO-SCAN equality path: prove no data was
      // read by physically removing partition C's files first
      val cDir = java.nio.file.Paths.get(s"$root/$gen0/p=C")
      Option(cDir.toFile.listFiles).get
        .filter(_.getName.endsWith(".parquet"))
        .foreach(f => Files.delete(f.toPath))
      spark.sql("DELETE FROM graft.docs WHERE k IN (2, 3)")
      assert(spark.sql("SELECT k FROM graft.docs WHERE p <> 'C'")
        .as[Long].collect().toSet === Set(1L))
      // routing proof: the new vector generation holds an EQUALITY
      // sidecar (the positional route would write positions only)
      val dvg = AtomicCommit.dvOf(
        AtomicCommit.readManifest(root).get.entries("A")).get
      assert(Files.exists(java.nio.file.Paths.get(root, dvg, "_graft_eq.jsonl")),
        "the key-list DELETE must take the equality (zero-scan) route")
      // bloom narrowing kept partition C out of the delete's write set
      assert(AtomicCommit.dvOf(
        AtomicCommit.readManifest(root).get.entries("C")).isEmpty,
        "bloom-rejected partition must not carry the equality record")
      // a DELETE that matches nothing burns no version
      val v = AtomicCommit.currentVersion(root).get
      spark.sql("DELETE FROM graft.docs WHERE k = 999")
      assert(AtomicCommit.currentVersion(root).get === v)
      // TRUNCATE is refused (tables stay non-empty by invariant)
      val t = intercept[Exception] { spark.sql("TRUNCATE TABLE graft.docs") }
      assert(t.getMessage.toLowerCase.contains("truncate"))
    } finally {
      spark.conf.unset("spark.graft.table.docs")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }
  test("DDL: CREATE TABLE, CTAS, registration over existing data, DROP") {
    val loc1 = Files.createTempDirectory("graft_ddl1").toString
    val loc2 = Files.createTempDirectory("graft_ddl2").toString
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    try {
      // CREATE over an empty root: declaration only, reads as empty,
      // SQL-facing column order is the declared one
      spark.sql("CREATE TABLE graft.ddl1 (k BIGINT, v STRING, p STRING) " +
        s"PARTITIONED BY (p) LOCATION '$loc1'")
      assert(spark.sql("SELECT * FROM graft.ddl1").columns.toSeq ===
        Seq("k", "v", "p"))
      assert(spark.sql("SELECT * FROM graft.ddl1").count() === 0L)
      // first INSERT creates the table (manifest v1); order is stable
      // across the first commit (physical layout puts p last anyway here)
      spark.sql("INSERT INTO graft.ddl1 VALUES (1, 'x', 'a'), (2, 'y', 'b')")
      assert(AtomicCommit.currentVersion(loc1).get === 1L)
      assert(spark.sql("SELECT * FROM graft.ddl1").columns.toSeq ===
        Seq("k", "v", "p"))
      assert(spark.sql("SELECT k FROM graft.ddl1 WHERE p = 'a'").as[Long]
        .collect().toSet === Set(1L))
      // declared order holds even when the partition column is NOT
      // declared last: a second declared table, column order (p, k)
      val loc3 = Files.createTempDirectory("graft_ddl3").toString
      spark.sql("CREATE TABLE graft.ddl3 (p STRING, k BIGINT) " +
        s"PARTITIONED BY (p) LOCATION '$loc3'")
      spark.sql("INSERT INTO graft.ddl3 VALUES ('a', 10), ('b', 20)")
      assert(spark.sql("SELECT * FROM graft.ddl3").columns.toSeq ===
        Seq("p", "k"), "declared order must survive the first commit")
      assert(spark.sql("SELECT k FROM graft.ddl3 WHERE p = 'b'").as[Long]
        .collect().toSet === Set(20L))
      // CTAS: schema from the query, write creates version 1
      spark.sql("CREATE TABLE graft.ddl2 PARTITIONED BY (p) " +
        s"LOCATION '$loc2' AS SELECT k, v, p FROM graft.ddl1")
      assert(spark.sql("SELECT count(*) FROM graft.ddl2").as[Long]
        .head() === 2L)
      // CREATE over a root that already holds a manifest = registration
      spark.sql(s"CREATE TABLE graft.ddl2again LOCATION '$loc2'")
      assert(spark.sql("SELECT count(*) FROM graft.ddl2again").as[Long]
        .head() === 2L)
      // duplicate name is a loud conflict
      val dup = intercept[Exception] {
        spark.sql(s"CREATE TABLE graft.ddl1 (x INT) PARTITIONED BY (x) " +
          s"LOCATION '$loc1'")
      }
      assert(dup.getMessage.toLowerCase.contains("already exists"))
      // DROP unregisters the name; data stays; re-registration revives it
      spark.sql("DROP TABLE graft.ddl1")
      intercept[Exception] { spark.sql("SELECT * FROM graft.ddl1").collect() }
      assert(AtomicCommit.currentVersion(loc1).get === 1L,
        "DROP must not touch data")
      spark.conf.set("spark.graft.table.ddl1", loc1)
      assert(spark.sql("SELECT count(*) FROM graft.ddl1").as[Long]
        .head() === 2L)
    } finally {
      Seq("ddl1", "ddl2", "ddl2again", "ddl3").foreach(n =>
        if (spark.conf.getOption(s"spark.graft.table.$n").isDefined)
          spark.conf.unset(s"spark.graft.table.$n"))
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("ALTER TABLE ADD COLUMN(S): NULL backfill, footer handoff, loud rejections") {
    val root = Files.createTempDirectory("graft_cat_alter").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.alt", root)
    try {
      val v0 = AtomicCommit.currentVersion(root).get
      spark.sql("ALTER TABLE graft.alt ADD COLUMN note STRING")
      // a metadata commit: version bumped, no data touched
      assert(AtomicCommit.currentVersion(root).get === v0 + 1)
      assert(AtomicCommit.history(root).last.kind === "metadata")
      // the schema grows immediately; existing rows read NULL-backfilled
      assert(spark.table("graft.alt").schema.fieldNames.toSeq
        === Seq("k", "v", "p", "note"))
      assert(spark.sql("SELECT k FROM graft.alt WHERE note IS NULL")
        .as[Long].collect().toSet === Set(1L, 2L))
      // the first INSERT carrying the column hands type ownership to the
      // footers; old rows stay NULL, the new row reads its value
      spark.sql("INSERT INTO graft.alt VALUES (3, 30, 'C', 'fresh')")
      val got = spark.sql("SELECT k, note FROM graft.alt")
        .as[(Long, Option[String])].collect().toMap
      assert(got === Map(1L -> None, 2L -> None, 3L -> Some("fresh")))
      // multi-column form
      spark.sql("ALTER TABLE graft.alt ADD COLUMNS (score DOUBLE, tag STRING)")
      assert(spark.sql("SELECT count(*) FROM graft.alt WHERE score IS NULL")
        .as[Long].head() === 3L)
      // an unsupported change class keeps the loud rejection naming the
      // supported verbs (rename/drop are now real — ColumnMappingSpec)
      val e1 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.alt ALTER COLUMN v COMMENT 'x'")
      }
      assert(e1.getMessage.contains("ADD COLUMN"), e1.getMessage)
      // a colliding name is refused
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.alt ADD COLUMN v BIGINT")
      }
      assert(e2.getMessage.contains("already exists"), e2.getMessage)
      // explicit user NOT NULL is refused, not silently relaxed —
      // existing rows backfill NULL, so the constraint could never hold
      // (analyzer-generated MERGE evolution adds coerce; MergeSpec)
      val e3 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.alt ADD COLUMN mand STRING NOT NULL")
      }
      assert(e3.getMessage.contains("NOT NULL"), e3.getMessage)
      assert(!spark.table("graft.alt").columns.contains("mand"))
    } finally {
      spark.conf.unset("spark.graft.table.alt")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT: ANSI CHECK DDL onto the engine's rules") {
    val root = Files.createTempDirectory("graft_cat_cons").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.con", root)
    try {
      spark.sql("ALTER TABLE graft.con ADD CONSTRAINT v_pos CHECK (v > 0)")
      // recorded in manifest props — it binds EVERY writer, Scala API too
      assert(AtomicCommit.constraints(root) === Map("v_pos" -> "v > 0"))
      assert(AtomicCommit.history(root).last.kind === "metadata")
      // a violating SQL INSERT aborts (Spark's analyzer guards the plan
      // via Table.constraints(); the engine's stage enforcement backs it)
      intercept[Exception] {
        spark.sql("INSERT INTO graft.con VALUES (3, -5, 'A')")
      }
      assert(spark.sql("SELECT count(*) FROM graft.con WHERE v <= 0")
        .as[Long].head() === 0L)
      // ... and so does a Scala-API writer the analyzer never sees
      intercept[AtomicCommit.ConstraintViolationException] {
        AtomicCommit.commitAppendPartitions(spark, root,
          Seq((4L, -1L, "B")).toDF("k", "v", "p"), "p", 1)
      }
      // ADD validates ALL existing rows first: a rule current data breaks
      // is refused and nothing is recorded
      intercept[Exception] {
        spark.sql("ALTER TABLE graft.con ADD CONSTRAINT v_tiny CHECK (v < 15)")
      }
      assert(AtomicCommit.constraints(root) === Map("v_pos" -> "v > 0"))
      // DESCRIBE EXTENDED surfaces the constraint through the DSv2 face
      val desc = spark.sql("DESCRIBE TABLE EXTENDED graft.con").collect()
        .map(r => s"${r.getString(0)}|${r.getString(1)}").mkString("\n")
      assert(desc.contains("v_pos") && desc.contains("CHECK (v > 0)"), desc)
      // unenforceable constraint kinds are rejected, not silently recorded
      val e = intercept[Exception] {
        spark.sql("ALTER TABLE graft.con ADD CONSTRAINT pk PRIMARY KEY (k)")
      }
      assert(e.getMessage.contains("CHECK constraints only"), e.getMessage)
      // DROP releases enforcement; IF EXISTS no-ops on an absent name,
      // a bare absent name fails loudly
      spark.sql("ALTER TABLE graft.con DROP CONSTRAINT v_pos")
      assert(AtomicCommit.constraints(root) === Map.empty)
      spark.sql("INSERT INTO graft.con VALUES (5, -9, 'A')")
      spark.sql("ALTER TABLE graft.con DROP CONSTRAINT IF EXISTS nope")
      val e2 = intercept[Exception] {
        spark.sql("ALTER TABLE graft.con DROP CONSTRAINT nope")
      }
      assert(e2.getMessage.contains("no constraint"), e2.getMessage)
    } finally {
      spark.conf.unset("spark.graft.table.con")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }
}
