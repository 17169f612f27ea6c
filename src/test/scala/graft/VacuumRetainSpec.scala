package graft

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import graft.sources.{AtomicCommit, PosixManifestStore}

/** TIME-BASED vacuum retention: `retainMillis` keeps every snapshot whose
  * commit stamp falls inside the wall-clock window — the "time travel for
  * the last N days" operating contract — composing with (never narrowing)
  * `keepVersions` and tag pinning. Versions predating commit stamping
  * have no stamp and are outside any time window (version/tag retention
  * still protects them).
  */
class VacuumRetainSpec extends SparkSpec {
  import spark.implicits._

  private def commit(root: String, k: Long, p: String = "A"): Long =
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((k, p, k * 10)).toDF("k", "flag", "v"), "flag")

  /** Forge a version's commit stamp in place (the bytes of an old table). */
  private def ageStamp(root: String, v: Long, toMillis: Long): Unit = {
    val p = Paths.get(root, f"_graft_manifest.v$v%08d.json")
    val body = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replaceAll(""""graft\.commit\.when":"\d+"""",
        s""""graft.commit.when":"$toMillis"""")
    Files.write(p, body.getBytes(StandardCharsets.UTF_8))
  }

  test("retainMillis keeps the window, drops beyond it, tags still pin") {
    val root = Files.createTempDirectory("graft_vr").toString
    commit(root, 1L); commit(root, 2L); commit(root, 3L); commit(root, 4L)
    val now = System.currentTimeMillis()
    ageStamp(root, 1L, now - 72L * 3600 * 1000) // 3 days old
    ageStamp(root, 2L, now - 48L * 3600 * 1000) // 2 days old, tagged below
    ageStamp(root, 3L, now - 30L * 60 * 1000)   // 30 min old
    AtomicCommit.tag(root, "audit", 2L)          // v5, props-only
    // keep 1 version + everything committed in the last hour + tags
    AtomicCommit.vacuum(root, new PosixManifestStore(root),
      orphanAgeMillis = 3600000L, keepVersions = 1,
      retainMillis = 3600000L)
    // v1 beyond every net; v2 pinned by the tag; v3 inside the hour;
    // v4 inside the hour; v5 is head
    assert(AtomicCommit.versions(root) === Seq(2L, 3L, 4L, 5L))
    // the kept snapshots stay fully readable (their generations survive)
    assert(AtomicCommit.readAt(spark, root, 3L)
      .select("k").as[Long].head() === 3L)
    assert(AtomicCommit.readTag(spark, root, "audit")
      .select("k").as[Long].head() === 2L)
  }

  test("retainMillis=0 is exactly the version-count behavior") {
    val root = Files.createTempDirectory("graft_vr0").toString
    commit(root, 1L); commit(root, 2L); commit(root, 3L)
    AtomicCommit.vacuum(root, keepVersions = 2)
    assert(AtomicCommit.versions(root) === Seq(2L, 3L))
  }

  test("unstamped legacy versions fall outside any time window") {
    val root = Files.createTempDirectory("graft_vrl").toString
    commit(root, 1L); commit(root, 2L)
    // strip v1's stamp: the manifest an older engine wrote
    val p = Paths.get(root, "_graft_manifest.v00000001.json")
    val stripped = new String(Files.readAllBytes(p), StandardCharsets.UTF_8)
      .replaceAll(""""graft\.commit\.when":"\d+",?""", "")
    Files.write(p, stripped.getBytes(StandardCharsets.UTF_8))
    AtomicCommit.vacuum(root, new PosixManifestStore(root),
      orphanAgeMillis = 3600000L, keepVersions = 1,
      retainMillis = 24L * 3600 * 1000)
    assert(AtomicCommit.versions(root) === Seq(2L))
  }
}
