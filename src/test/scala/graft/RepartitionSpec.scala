package graft

import java.nio.file.Files

import graft.sources.{AtomicCommit, DataSkipping, InMemoryObjectStore}

/** Partition evolution ([[graft.sources.AtomicCommit.commitRepartition]]):
  * re-keying the table under a different partition column as one
  * whole-snapshot rewrite commit. Contract under test: content is
  * byte-identical across the boundary, OLD versions still read and
  * time-travel under the OLD column, the new layout prunes on the new
  * key, directory-encoded values round-trip verbatim into data columns,
  * and any concurrent commit aborts the rewrite.
  */
class RepartitionSpec extends SparkSpec {
  import spark.implicits._

  test("re-key lang -> day: content identical, history reads under the old column") {
    val root = Files.createTempDirectory("graft_repart").toString
    // zero-padded day values: the type-inference trap — "01" must stay "01"
    val rows = (0 until 60).map { i =>
      (i.toLong, if (i % 2 == 0) "de" else "fr", f"0${i % 3}%s".take(2), i * 10L)
    }
    val v1 = AtomicCommit.commitReplacePartitions(spark, root,
      rows.toDF("k", "lang", "day", "v"), "lang")
    val pre = AtomicCommit.read(spark, root)
      .select("k", "lang", "day", "v").as[(Long, String, String, Long)]
      .collect().toSet
    assert(pre.map(_._3) === Set("00", "01", "02"))

    val v2 = AtomicCommit.commitRepartition(spark, root, "day")
    assert(v2 === v1 + 1)
    val m = AtomicCommit.readManifest(root).get
    assert(m.partitionCol === "day")
    assert(m.entries.keySet === Set("00", "01", "02"),
      "zero-padded values must survive the re-key verbatim")
    // content byte-identical; the old partition column is now stored data
    val post = AtomicCommit.read(spark, root)
      .select("k", "lang", "day", "v").as[(Long, String, String, Long)]
      .collect().toSet
    assert(post === pre)
    // the new key prunes at manifest level
    val one = AtomicCommit.readPartitions(spark, root, Seq("01")).get
    assert(one.count() === pre.count(_._3 == "01"))
    assert(one.inputFiles.forall(_.contains("day=01")))
    // history: version 1 still reads under lang
    val old = AtomicCommit.readAt(spark, root, v1)
    assert(old.select("k", "lang", "day", "v")
      .as[(Long, String, String, Long)].collect().toSet === pre)
    assert(old.inputFiles.forall(_.contains("lang=")))
  }

  test("a concurrent commit aborts the rewrite; stats work on the new layout") {
    val root = Files.createTempDirectory("graft_repart2").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      (0L until 40L).map(i => (i, if (i < 20) "a" else "b", i))
        .toDF("k", "p2", "v").withColumn("p",
          org.apache.spark.sql.functions.lit("x")),
      "p", 1)
    val staged = AtomicCommit.stageRepartition(spark, root, store, "p2", 1)
    // someone commits while the rewrite is staged (an append, so the
    // retry below also proves the appended row is carried into the re-key)
    AtomicCommit.commitAppendPartitions(spark, root, store,
      Seq(("x", 99L, "a", 99L)).toDF("p", "k", "p2", "v"), "p", 1)
    intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.publishRewrite(root, store, staged)
    }
    // the loser protocol: re-stage against the refreshed snapshot
    val staged2 = AtomicCommit.stageRepartition(spark, root, store, "p2", 1)
    DataSkipping.annotateStaged(spark, root, staged2, Seq("v"))
    AtomicCommit.publishRewrite(root, store, staged2)
    assert(AtomicCommit.readManifest(store).get.partitionCol === "p2")
    assert(AtomicCommit.read(spark, root, store).count() === 41L)
    // skipping evidence annotated between the phases prunes on day one
    val got = DataSkipping.readWhere(spark, root, store, "v", 0L, 10L)
    assert(got.count() === 11L)
    assert(got.inputFiles.forall(_.contains("p2=a")),
      "v<=10 rows all live in p2=a; p2=b's stats must prune it")
    // evolving to a missing column fails loudly
    intercept[IllegalArgumentException] {
      AtomicCommit.stageRepartition(spark, root, store, "nope", 1)
    }
  }
}
