package graft

import java.nio.file.Files

import graft.sources.AtomicCommit

/** [[graft.plans.GraftDmlRewrite]] — real SQL `UPDATE` and `MERGE INTO`
  * against graft catalog tables, lowered onto partition-CoW commits and
  * the [[graft.sources.Merge]] builder. The full DML square (INSERT /
  * DELETE came with the catalog; UPDATE / MERGE land here).
  */
class GraftDmlSpec extends SparkSpec {
  import spark.implicits._

  private def register(name: String, root: String): Unit = {
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set(s"spark.graft.table.$name", root)
  }

  private def unregister(name: String): Unit = {
    spark.conf.unset("spark.sql.catalog.graft")
    spark.conf.unset(s"spark.graft.table.$name")
  }

  private def seed(root: String): Unit =
    AtomicCommit.commitReplacePartitions(spark, root, Seq(
      (1L, 10L, "open", "A"), (2L, 20L, "open", "A"),
      (3L, 30L, "open", "B"), (4L, 40L, "closed", "B"),
      (5L, 50L, "open", "C")).toDF("k", "v", "status", "p"), "p")

  test("UPDATE: conditional set, expression values, partition-CoW, no-op burns no version") {
    val root = Files.createTempDirectory("graft_dml_upd").toString
    seed(root)
    register("du", root)
    try {
      val before = AtomicCommit.readManifest(root).get
      spark.sql("UPDATE graft.du SET v = v + 100, status = 'hot' WHERE k >= 4")
      val after = AtomicCommit.readManifest(root).get
      assert(after.version === before.version + 1)
      // partition A holds no matching row: its generation is untouched
      assert(after.entries("A") === before.entries("A"))
      assert(after.entries("B") !== before.entries("B"))
      val got = spark.sql("SELECT k, v, status FROM graft.du")
        .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(1L -> ((10L, "open")), 2L -> ((20L, "open")),
        3L -> ((30L, "open")), 4L -> ((140L, "hot")), 5L -> ((150L, "hot"))))
      // WHERE matching nothing: no commit
      spark.sql("UPDATE graft.du SET v = 0 WHERE k = 999")
      assert(AtomicCommit.readManifest(root).get.version === after.version)
      // updating the partition column is rejected loudly
      val e = intercept[RuntimeException] {
        spark.sql("UPDATE graft.du SET p = 'Z' WHERE k = 1")
      }
      assert(e.getMessage.contains("partition column"))
      // unconditioned UPDATE touches every row
      spark.sql("UPDATE graft.du SET status = 'done'")
      assert(spark.sql("SELECT count(*) FROM graft.du WHERE status = 'done'")
        .as[Long].head() === 5L)
    } finally unregister("du")
  }

  test("MERGE INTO: full clause square through SQL, one commit") {
    val root = Files.createTempDirectory("graft_dml_merge").toString
    seed(root)
    register("dm", root)
    try {
      Seq((1L, 11L, "keep", "A"), (5L, 0L, "del", "C"), (6L, 60L, "new", "D"))
        .toDF("k", "v", "op", "p").createOrReplaceTempView("changes")
      val v0 = AtomicCommit.readManifest(root).get.version
      spark.sql(
        """MERGE INTO graft.dm t USING changes s ON t.k = s.k
          |WHEN MATCHED AND s.op = 'del' THEN DELETE
          |WHEN MATCHED THEN UPDATE SET v = s.v
          |WHEN NOT MATCHED THEN INSERT (k, v, status, p) VALUES (s.k, s.v, 'new', s.p)
          |WHEN NOT MATCHED BY SOURCE AND t.status = 'open' THEN UPDATE SET status = 'stale'
          |""".stripMargin)
      assert(AtomicCommit.readManifest(root).get.version === v0 + 1,
        "the whole MERGE is ONE commit")
      val got = spark.sql("SELECT k, v, status FROM graft.dm")
        .as[(Long, Long, String)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got === Map(
        1L -> ((11L, "open")),   // matched, updated
        2L -> ((20L, "stale")),  // by-source, open → stale
        3L -> ((30L, "stale")),
        4L -> ((40L, "closed")), // by-source condition false → kept
        6L -> ((60L, "new"))))   // inserted (k=5 deleted)
      // partition C emptied by the delete: dropped from the manifest
      assert(!AtomicCommit.readManifest(root).get.entries.contains("C"))
    } finally unregister("dm")
  }

  test("MERGE INTO: UPDATE SET * / INSERT * and differently-named source keys") {
    val root = Files.createTempDirectory("graft_dml_star").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    register("ds", root)
    try {
      Seq((2L, 21L, "B"), (3L, 30L, "A"))
        .toDF("id", "v", "p").createOrReplaceTempView("ups")
      spark.sql(
        """MERGE INTO graft.ds t USING (SELECT id AS k, v, p FROM ups) s
          |ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET *
          |WHEN NOT MATCHED THEN INSERT *
          |""".stripMargin)
      val got = spark.sql("SELECT k, v FROM graft.ds")
        .as[(Long, Long)].collect().toMap
      assert(got === Map(1L -> 10L, 2L -> 21L, 3L -> 30L))
      // a non-equi ON is rejected with the contract named
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO graft.ds t USING (SELECT id AS k, v, p FROM ups) s
            |ON t.k < s.k WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("conjunction of target-column"))
    } finally unregister("ds")
  }

  test("DELETE FROM routes by shape: CoW on partition-only, MoR for SQL-only expressions") {
    val root = Files.createTempDirectory("graft_dml_del").toString
    seed(root)
    register("dd", root)
    try {
      val m0 = AtomicCommit.readManifest(root).get
      val gen0 = AtomicCommit.ownersOf(m0.entries("B"))
      // an expression BEYOND the V1 filter grammar the SupportsDelete
      // face carries (length + arithmetic) → positional MoR: rows gone,
      // data owners untouched, no partition rewrite
      spark.sql("DELETE FROM graft.dd WHERE length(status) = 6 AND v + 0 = 40")
      assert(spark.sql("SELECT k FROM graft.dd").as[Long].collect().toSet
        === Set(1L, 2L, 3L, 5L))
      val m1 = AtomicCommit.readManifest(root).get
      assert(AtomicCommit.ownersOf(m1.entries("B")) === gen0,
        "MoR: the data generation survives the delete untouched")
      assert(AtomicCommit.history(root).last.kind === "rowdelete")
      // the pre-delete snapshot stays time-travelable
      assert(spark.sql(s"SELECT k FROM graft.dd VERSION AS OF ${m0.version}")
        .as[Long].collect().toSet === Set(1L, 2L, 3L, 4L, 5L))
      // a partition-column-only predicate → partition-CoW: the matched
      // partition DROPS from the manifest (no merge-on-read evidence)
      spark.sql("DELETE FROM graft.dd WHERE p = 'C'")
      val m2 = AtomicCommit.readManifest(root).get
      assert(!m2.entries.contains("C"))
      assert(AtomicCommit.history(root).last.kind === "drop")
      assert(spark.sql("SELECT k FROM graft.dd").as[Long].collect().toSet
        === Set(1L, 2L, 3L))
      // DELETE with no WHERE is refused like TRUNCATE
      val e = intercept[RuntimeException] { spark.sql("DELETE FROM graft.dd") }
      assert(e.getMessage.contains("non-empty"), e.getMessage)
    } finally unregister("dd")
  }

  test("MERGE ON keys see through analyzer widening casts (INT source vs BIGINT key)") {
    val root = Files.createTempDirectory("graft_dml_cast").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    register("dc", root)
    try {
      // an INT literal source (SELECT 2 AS k) against the BIGINT target
      // key: the analyzer wraps s.k in cast(s.k AS bigint); the builder's
      // own t/s join re-derives that exact coercion, so the lowering must
      // accept it rather than reject the ON shape (regression: the fuzz
      // spec's MERGE counter hit this)
      spark.sql(
        """MERGE INTO graft.dc t USING (SELECT 2 AS k) s ON t.k = s.k
          |WHEN MATCHED THEN UPDATE SET v = t.v + 1""".stripMargin)
      assert(spark.sql("SELECT v FROM graft.dc WHERE k = 2")
        .as[Long].head() === 21L)
      // a non-column key expression is still NOT the builder's join:
      // rejected with the contract named
      val e = intercept[Exception] {
        spark.sql(
          """MERGE INTO graft.dc t USING (SELECT 2 AS k) s ON t.k = s.k + 1
            |WHEN MATCHED THEN DELETE""".stripMargin)
      }
      assert(e.getMessage.contains("conjunction of target-column"))
    } finally unregister("dc")
  }

  test("UPDATE of a hidden-partitioning SOURCE column is rejected; others update") {
    import org.apache.spark.sql.functions.{col, to_timestamp}
    import graft.sources.{HiddenPartitioning => HP}
    val root = Files.createTempDirectory("graft_dml_hp").toString
    val rows = Seq((1L, 10L, "2024-03-01T05:00:00Z"), (2L, 20L, "2024-03-02T06:00:00Z"))
      .toDF("k", "v", "iso")
      .select(col("k"), col("v"), to_timestamp(col("iso")).as("ts"))
    HP.commitReplace(spark, root, rows, HP.Days("ts"))
    register("hp", root)
    try {
      // SET on the transform source would leave ts_day stale — every
      // later ts-predicate read would prune by the old day key
      val e = intercept[RuntimeException] {
        spark.sql("UPDATE graft.hp SET ts = TIMESTAMP'2024-05-05 00:00:00' WHERE k = 1")
      }
      assert(e.getMessage.contains("days(ts)"), e.getMessage)
      // non-source columns still update normally on the same table
      spark.sql("UPDATE graft.hp SET v = 99 WHERE k = 1")
      assert(spark.sql("SELECT v FROM graft.hp WHERE k = 1")
        .as[Long].head() === 99L)
    } finally unregister("hp")
  }
}
