package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.{AtomicCommit, PosixManifestStore}

/** TIMESTAMP-based time travel: every published version carries a commit
  * timestamp (`graft.commit.when`, epoch millis) stamped monotonically
  * within its lineage, and `TIMESTAMP AS OF` resolves to the latest
  * version committed at or before the asked instant — over the Scala API
  * ([[AtomicCommit.versionAsOfTimestamp]]/[[AtomicCommit.readAsOfTimestamp]]),
  * the catalog SQL syntax (the DSv2 micros hook), and the view-surface
  * `timestampAsOf` option.
  */
class TimeTravelSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot() = Files.createTempDirectory("graft_tt").toString

  private def commit(root: String, k: Long): Long =
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((k, "A", k * 10)).toDF("k", "flag", "v"), "flag")

  private def whenOf(root: String, v: Long): Long =
    AtomicCommit.commitTimeMillis(
      AtomicCommit.manifestAt(new PosixManifestStore(root), root, v))
      .getOrElse(fail(s"v$v carries no commit stamp"))

  test("every commit is stamped, strictly monotonic, including rollbacks") {
    val root = freshRoot()
    commit(root, 1L); commit(root, 2L); commit(root, 3L)
    val whens = (1L to 3L).map(whenOf(root, _))
    assert(whens === whens.sorted && whens.distinct.size === 3,
      s"stamps not strictly increasing: $whens")
    // a rollback is a NEW commit: old data, fresh timestamp
    AtomicCommit.rollbackTo(root, 1L)
    assert(whenOf(root, 4L) > whens.last)
  }

  test("versionAsOfTimestamp: latest at-or-before; boundaries; horizon errors") {
    val root = freshRoot()
    commit(root, 1L); commit(root, 2L); commit(root, 3L)
    val (w1, w2, w3) = (whenOf(root, 1L), whenOf(root, 2L), whenOf(root, 3L))
    assert(AtomicCommit.versionAsOfTimestamp(root, w1) === 1L)
    assert(AtomicCommit.versionAsOfTimestamp(root, w2 - 1) === 1L)
    assert(AtomicCommit.versionAsOfTimestamp(root, w2) === 2L)
    assert(AtomicCommit.versionAsOfTimestamp(root, w3) === 3L)
    // after the last commit, the head IS the state at that moment
    assert(AtomicCommit.versionAsOfTimestamp(root, w3 + 3600000L) === 3L)
    // before the first commit: no version existed — loud error
    val e = intercept[RuntimeException] {
      AtomicCommit.versionAsOfTimestamp(root, w1 - 1)
    }
    assert(e.getMessage.contains("predates"))
    // the data face
    assert(AtomicCommit.readAsOfTimestamp(spark, root, w2 - 1)
      .select("k").as[Long].collect().toSeq === Seq(1L))
    // vacuum is the horizon for timestamps exactly as for versions
    AtomicCommit.vacuum(root, keepVersions = 1)
    assert(AtomicCommit.versionAsOfTimestamp(root, w3) === 3L)
    intercept[RuntimeException] {
      AtomicCommit.versionAsOfTimestamp(root, w2)
    }
  }

  test("versions published before stamping existed count as arbitrarily old") {
    val root = freshRoot()
    commit(root, 1L)
    // forge a PRE-STAMP manifest: strip v1's commit stamp in place (the
    // bytes an older engine would have written)
    val p = Paths.get(root, "_graft_manifest.v00000001.json")
    val stripped = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replaceAll(""""graft\.commit\.when":"\d+",?""", "")
      .replace(",}", "}")
    Files.write(p, stripped.getBytes(StandardCharsets.UTF_8))
    assert(AtomicCommit.commitTimeMillis(
      AtomicCommit.manifestAt(new PosixManifestStore(root), root, 1L)).isEmpty)
    commit(root, 2L)
    val w2 = whenOf(root, 2L)
    // the unstamped v1 serves any instant before v2's stamp
    assert(AtomicCommit.versionAsOfTimestamp(root, w2 - 1) === 1L)
    assert(AtomicCommit.versionAsOfTimestamp(root, w2) === 2L)
  }

  test("SQL TIMESTAMP AS OF through the catalog; timestampAsOf on the view") {
    val root = freshRoot()
    commit(root, 1L); commit(root, 2L)
    val (w1, w2) = (whenOf(root, 1L), whenOf(root, 2L))
    spark.conf.set("spark.sql.catalog.graft_tt", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.events", root)
    try {
      // the DSv2 hook receives the literal as micros in the session
      // timezone; java.sql.Timestamp renders/parses in the same JVM zone,
      // so the string round-trips to the stamped instant
      def lit(ms: Long) = new java.sql.Timestamp(ms).toString
      assert(spark.sql("SELECT k FROM graft_tt.events TIMESTAMP AS OF " +
        s"'${lit(w1)}'").as[Long].head() === 1L)
      assert(spark.sql("SELECT k FROM graft_tt.events TIMESTAMP AS OF " +
        s"'${lit(w2)}'").as[Long].head() === 2L)
      // view-surface option form: epoch millis or a timestamp literal
      val byMillis = spark.read.format("graft")
        .option("path", root).option("timestampAsOf", w1.toString).load()
      assert(byMillis.select("k").as[Long].head() === 1L)
      val byLiteral = spark.read.format("graft")
        .option("path", root).option("timestampAsOf", lit(w2)).load()
      assert(byLiteral.select("k").as[Long].head() === 2L)
      val e = intercept[Exception] {
        spark.read.format("graft").option("path", root)
          .option("timestampAsOf", w1.toString)
          .option("versionAsOf", "1").load()
      }
      assert(e.getMessage.contains("mutually exclusive"))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft_tt")
      spark.conf.unset("spark.graft.table.events")
    }
  }
}
