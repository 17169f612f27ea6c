package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, DataSkipping, Deletes}

/** [[graft.sources.GraftDataSource]] — SQL addressing of manifest tables:
  * `CREATE TEMPORARY VIEW ... USING graft` must return exactly what
  * [[AtomicCommit.read]] returns (same delegate plan), with manifest- and
  * stats-level pruning proven the strong way — pruned directories'
  * DATA FILES physically removed, the query still answering — plus time
  * travel, branch, and deletion-vector reads through the same surface.
  */
class GraftDataSourceSpec extends SparkSpec {
  import spark.implicits._

  test("USING graft: SQL rows equal the Scala API; projections and filters work") {
    val root = Files.createTempDirectory("graft_ds").toString
    DataSkipping.commitWithStats(spark, root,
      ((1L to 10L).map(i => (i, "A", i)) ++ (101L to 110L).map(i => (i, "B", i)))
        .toDF("k", "flag", "v"), "flag", Seq("v"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gds USING graft OPTIONS (path '$root')")
    val viaSql = spark.sql("SELECT k, flag, v FROM gds")
      .as[(Long, String, Long)].collect().toSet
    val viaApi = AtomicCommit.read(spark, root)
      .select("k", "flag", "v").as[(Long, String, Long)].collect().toSet
    assert(viaSql === viaApi)
    assert(spark.sql("SELECT sum(v) FROM gds WHERE flag = 'B'")
      .as[Long].head() === (101L to 110L).sum)
    assert(spark.sql("SELECT count(*) FROM gds").as[Long].head() === 20L)
    // format() reader path, same relation
    assert(spark.read.format("graft").option("path", root).load()
      .count() === 20L)
  }

  test("pushed filters prune at the MANIFEST level: excluded dirs never read") {
    val root = Files.createTempDirectory("graft_ds_pr").toString
    DataSkipping.commitWithStats(spark, root,
      ((1L to 10L).map(i => (i, "A", i)) ++ (101L to 110L).map(i => (i, "B", i)) ++
        (1001L to 1010L).map(i => (i, "C", i))).toDF("k", "flag", "v"),
      "flag", Seq("v"))
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gdsp USING graft OPTIONS (path '$root')")
    // the strong proof: physically delete partition C's data files; a
    // query whose filters exclude C must neither list nor read them
    val m = AtomicCommit.readManifest(root).get
    val genC = AtomicCommit.ownersOf(m.entries("C")).head
    val cDir = java.nio.file.Paths.get(s"$root/$genC/flag=C")
    Option(cDir.toFile.listFiles).get.filter(_.getName.endsWith(".parquet"))
      .foreach(f => Files.delete(f.toPath))
    // partition-column equality prunes off the manifest keys
    assert(spark.sql("SELECT count(*) FROM gdsp WHERE flag = 'A'")
      .as[Long].head() === 10L)
    // stats range (two one-sided pushes folded to an interval) prunes C
    assert(spark.sql("SELECT count(*) FROM gdsp WHERE v >= 1 AND v <= 110")
      .as[Long].head() === 20L)
    // equality on the stats column is a degenerate interval
    assert(spark.sql("SELECT k FROM gdsp WHERE v = 105").as[Long].head() === 105L)
  }

  test("versionAsOf / tagAsOf / branch options; DV merge flows through SQL") {
    val root = Files.createTempDirectory("graft_ds_tt").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L), (2L, "A", 20L)).toDF("k", "flag", "v"), "flag")
    AtomicCommit.tag(root, "first", 1L)
    Deletes.deleteWhereMoR(spark, root, col("k") === 2L) // v3: MoR vector
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gdsv USING graft OPTIONS (path '$root')")
    // current: the deletion vector applies through the SQL surface
    assert(spark.sql("SELECT k FROM gdsv").as[Long].collect().toSet === Set(1L))
    // time travel by version and by tag see the pre-delete snapshot
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gdsv1 USING graft " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    assert(spark.sql("SELECT count(*) FROM gdsv1").as[Long].head() === 2L)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gdst USING graft " +
      s"OPTIONS (path '$root', tagAsOf 'first')")
    assert(spark.sql("SELECT count(*) FROM gdst").as[Long].head() === 2L)
    // a branch is its own lineage through the same option surface
    AtomicCommit.createBranch(root, new graft.sources.PosixManifestStore(root),
      "dev", None)
    val dev = AtomicCommit.branchStore(
      new graft.sources.PosixManifestStore(root), "dev")
    AtomicCommit.commitAppendPartitions(spark, root, dev,
      Seq((9L, "A", 90L)).toDF("k", "flag", "v"), "flag", 1)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gdsb USING graft " +
      s"OPTIONS (path '$root', branch 'dev')")
    assert(spark.sql("SELECT k FROM gdsb").as[Long].collect().toSet === Set(1L, 9L))
    assert(spark.sql("SELECT k FROM gdsv").as[Long].collect().toSet === Set(1L),
      "main view untouched by the branch commit")
  }

  test("write face: DataFrameWriter modes and INSERT INTO land on the commit paths") {
    val root = Files.createTempDirectory("graft_ds_w").toString
    // a NEW table needs partitionCol; ErrorIfExists creates it
    Seq((1L, "A", 10L), (2L, "B", 20L)).toDF("k", "flag", "v")
      .write.format("graft").option("path", root)
      .option("partitionCol", "flag").option("statsCols", "v")
      .mode("errorifexists").save()
    assert(AtomicCommit.read(spark, root).count() === 2L)
    // append mode commits O(batch) appended generations
    Seq((3L, "A", 30L)).toDF("k", "flag", "v")
      .write.format("graft").option("path", root).mode("append").save()
    val m = AtomicCommit.readManifest(root).get
    assert(AtomicCommit.ownersOf(m.entries("A")).size === 2, "append must grow the owner list")
    // INSERT INTO through a registered view
    spark.sql(s"CREATE OR REPLACE TEMPORARY VIEW gdw USING graft OPTIONS (path '$root')")
    // positional insert: the relation schema is (k, v, flag) — data
    // columns in footer order, the partition column last
    spark.sql("INSERT INTO gdw VALUES (4, 40, 'C')")
    assert(spark.sql("SELECT k FROM gdw").as[Long].collect().toSet ===
      Set(1L, 2L, 3L, 4L), "the view must track the table across commits")
    // overwrite replaces the WHOLE table in one commit (stale partitions drop)
    Seq((9L, "A", 90L)).toDF("k", "flag", "v")
      .write.format("graft").option("path", root).mode("overwrite").save()
    assert(AtomicCommit.readManifest(root).get.entries.keySet === Set("A"))
    assert(spark.sql("SELECT k FROM gdw").as[Long].collect().toSet === Set(9L))
    // the whole history stayed time-travelable
    assert(AtomicCommit.readAt(spark, root, 3L).count() === 4L)
    // constraints bind SQL writers too
    AtomicCommit.addConstraint(spark, root, new graft.sources.PosixManifestStore(root),
      "v_pos", "v > 0")
    intercept[Exception] {
      spark.sql("INSERT INTO gdw VALUES (5, -1, 'A')")
    }
    assert(spark.sql("SELECT k FROM gdw").as[Long].collect().toSet === Set(9L))
    // a time-travel view refuses inserts (it names an immutable snapshot)
    spark.sql("CREATE OR REPLACE TEMPORARY VIEW gdw1 USING graft " +
      s"OPTIONS (path '$root', versionAsOf '1')")
    intercept[Exception] { spark.sql("INSERT INTO gdw1 VALUES (6, 60, 'A')") }
  }
}
