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
}
