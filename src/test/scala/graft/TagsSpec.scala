package graft

import java.nio.file.Files

import graft.sources.{AtomicCommit, InMemoryObjectStore}

/** [[graft.sources.AtomicCommit]] tags — named snapshot pins (Iceberg's
  * tagged references): "the snapshot this training run read" recorded as
  * table metadata that [[AtomicCommit.vacuum]] honors. The contract under
  * test: a tag survives ANY retention horizon (manifest and generations
  * both), a released tag ages out normally, and tagging rides the same
  * CAS as data commits (atomically visible, conflict-free with writers).
  */
class TagsSpec extends SparkSpec {
  import spark.implicits._

  private def commitN(root: String, store: InMemoryObjectStore, n: Int): Long =
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", n.toLong, s"r$n")).toDF("p", "k", "v"), "p", 1)

  test("a tagged version survives vacuum past the retention horizon, untag releases it") {
    val root = Files.createTempDirectory("graft_tag").toString
    val store = new InMemoryObjectStore
    val v1 = commitN(root, store, 1)
    AtomicCommit.tag(root, store, "train-run-7", v1)
    // three more data versions push v1 far past keepVersions = 1
    (2 to 4).foreach(commitN(root, store, _))
    AtomicCommit.vacuum(root, store, 0L, 1)
    // the tag pins BOTH the manifest and the generation: full read works
    assert(AtomicCommit.tags(store) === Map("train-run-7" -> v1))
    val pinned = AtomicCommit.readTag(spark, root, store, "train-run-7")
      .select("k", "v").as[(Long, String)].collect().toSet
    assert(pinned === Set((1L, "r1")))
    // untagged versions inside the horizon vacuumed as usual
    assert(AtomicCommit.versions(store).toSet === Set(v1, 5L),
      "only the tagged version and the current one should remain")

    // release the pin: the next vacuum ages it out
    AtomicCommit.untag(root, store, "train-run-7")
    AtomicCommit.vacuum(root, store, 0L, 1)
    assert(AtomicCommit.tags(store) === Map.empty)
    assert(AtomicCommit.versions(store).toSet === Set(6L),
      "after untag only the current version survives")
    intercept[RuntimeException] {
      AtomicCommit.readTag(spark, root, store, "train-run-7")
    }
    // current data never touched by any of it
    assert(AtomicCommit.read(spark, root, store)
      .select("k").as[Long].collect().toSet === Set(4L))
  }

  test("tagging is a props-only commit: version bumps, entries untouched, data commits unaffected") {
    val root = Files.createTempDirectory("graft_tag2").toString
    val store = new InMemoryObjectStore
    val v1 = commitN(root, store, 1)
    val before = AtomicCommit.readManifest(store).get
    val tv = AtomicCommit.tag(root, store, "pin", v1)
    assert(tv === v1 + 1)
    val after = AtomicCommit.readManifest(store).get
    assert(after.entries === before.entries, "a tag moves no data")
    // tags do not disturb the exactly-once watermark or other props
    assert(after.props.get("graft.tag.pin") === Some(v1.toString))
    // a later data commit carries the tag forward
    commitN(root, store, 2)
    assert(AtomicCommit.tags(store) === Map("pin" -> v1))
    // tagging a vacuumed/never-published version fails loudly
    intercept[RuntimeException] {
      AtomicCommit.tag(root, store, "ghost", 999L)
    }
    // bad names rejected before any commit
    intercept[IllegalArgumentException] {
      AtomicCommit.tag(root, store, "br{ce", v1)
    }
  }
}
