package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, InMemoryObjectStore, PosixManifestStore}
import graft.streaming.AtomicStreamSink

/** The exactly-once contract of [[graft.streaming.AtomicStreamSink]]:
  * foreachBatch delivery is at-least-once, so the REPLAY cases carry the
  * guarantee — a batch id at or below the committed watermark must be a
  * no-op, because its rows already rode an atomic manifest swap together
  * with that watermark. Direct `commitBatch` calls pin the replay matrix
  * (same id, stale id, empty batch, per-queryKey independence) against
  * the object-store contract; a real file-source query with a checkpoint
  * restart then pins the end-to-end integration on the POSIX store.
  */
class AtomicStreamSinkSpec extends SparkSpec {
  import spark.implicits._

  private def freshRoot(): String =
    Files.createTempDirectory("graft_ass").toString

  private def table(root: String, store: graft.sources.ManifestStore): Set[(Long, String)] =
    AtomicCommit.read(spark, root, store)
      .select("id", "lang").as[(Long, String)].collect().toSet

  test("replayed batch ids are no-ops; fresh ids append — the watermark rides the commit") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    def batch(ids: Seq[Long], lang: String) =
      ids.map(i => (i, lang)).toDF("id", "lang")

    AtomicStreamSink.commitBatch(root, store, "lang", "q", batch(Seq(1L, 2L), "de"), 0L)
    assert(table(root, store) === Set((1L, "de"), (2L, "de")))
    assert(AtomicStreamSink.lastBatchId(store, "q") === Some(0L))

    // crash-replay of batch 0: identical content, must not duplicate
    AtomicStreamSink.commitBatch(root, store, "lang", "q", batch(Seq(1L, 2L), "de"), 0L)
    assert(table(root, store) === Set((1L, "de"), (2L, "de")), "replay duplicated rows")

    // batch 1 appends into an EXISTING partition (merge path) and a new one
    AtomicStreamSink.commitBatch(root, store, "lang", "q",
      batch(Seq(3L), "de").union(batch(Seq(4L), "fr")), 1L)
    assert(table(root, store) ===
      Set((1L, "de"), (2L, "de"), (3L, "de"), (4L, "fr")))

    // a STALE id arriving after a newer one (restart from an old
    // checkpoint) is also a no-op — watermark is monotone, not equality
    AtomicStreamSink.commitBatch(root, store, "lang", "q", batch(Seq(99L), "de"), 0L)
    assert(table(root, store) ===
      Set((1L, "de"), (2L, "de"), (3L, "de"), (4L, "fr")))
    assert(AtomicStreamSink.lastBatchId(store, "q") === Some(1L))
  }

  test("empty batches advance nothing and break nothing") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    val empty = Seq.empty[(Long, String)].toDF("id", "lang")
    // an empty FIRST batch: no manifest exists yet, and none may appear
    AtomicStreamSink.commitBatch(root, store, "lang", "q", empty, 0L)
    assert(AtomicCommit.readManifest(store).isEmpty)
    AtomicStreamSink.commitBatch(root, store, "lang", "q",
      Seq((1L, "de")).toDF("id", "lang"), 1L)
    AtomicStreamSink.commitBatch(root, store, "lang", "q", empty, 2L)
    assert(table(root, store) === Set((1L, "de")))
    // the watermark reflects the last DATA commit; replaying empty batch 2
    // after it is still fine because it commits nothing either way
    assert(AtomicStreamSink.lastBatchId(store, "q") === Some(1L))
  }

  test("two streams on one table: watermarks are per queryKey, commits interleave safely") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    AtomicStreamSink.commitBatch(root, store, "lang", "alpha",
      Seq((1L, "de")).toDF("id", "lang"), 0L)
    AtomicStreamSink.commitBatch(root, store, "lang", "beta",
      Seq((2L, "fr")).toDF("id", "lang"), 0L)
    // alpha's id-0 replay must be skipped even though beta committed SINCE
    AtomicStreamSink.commitBatch(root, store, "lang", "alpha",
      Seq((1L, "de")).toDF("id", "lang"), 0L)
    assert(table(root, store) === Set((1L, "de"), (2L, "fr")))
    assert(AtomicStreamSink.lastBatchId(store, "alpha") === Some(0L))
    assert(AtomicStreamSink.lastBatchId(store, "beta") === Some(0L))
  }

  test("statsCols: every streaming commit carries skipping evidence its readers can prune on") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    def batch(rows: Seq[(Long, String, Long)]) = rows.toDF("id", "lang", "n_chars")
    AtomicStreamSink.commitBatch(root, store, "lang", "q",
      batch(Seq((1L, "de", 10L), (2L, "fr", 5000L))), 0L, Seq("n_chars"))
    AtomicStreamSink.commitBatch(root, store, "lang", "q",
      batch(Seq((3L, "de", 20L))), 1L, Seq("n_chars"))
    val m = AtomicCommit.readManifest(store).get
    // appends grow owner LISTS — every owning generation carries stats
    m.entries.values.flatMap(AtomicCommit.ownersOf).toSeq.distinct.foreach { gen =>
      assert(java.nio.file.Files.exists(
        java.nio.file.Paths.get(root, gen, graft.sources.DataSkipping.StatsFile)))
    }
    val got = graft.sources.DataSkipping.readWhere(spark, root, store,
      "n_chars", 1000L, 9000L)
    assert(got.select("id").as[Long].collect().toSet === Set(2L))
    assert(got.inputFiles.forall(_.contains("lang=fr")),
      "de's [10,20] evidence must prune its directory")
  }

  test("CDC-apply: last version per key wins, tombstones delete, emptied partitions drop") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    def cdc(rows: Seq[(Long, String, Long, Long, Boolean)]) =
      rows.toDF("id", "lang", "score", "seq", "op_del")
    def state(): Set[(Long, String, Long)] =
      AtomicCommit.read(spark, root, store)
        .select("id", "lang", "score").as[(Long, String, Long)].collect().toSet

    // batch 0: inserts, including TWO versions of id=1 — seq 5 must win
    AtomicStreamSink.upsertBatch(root, store, "lang", "id", "cdc",
      cdc(Seq((1L, "de", 10L, 1L, false), (1L, "de", 11L, 5L, false),
        (2L, "fr", 20L, 2L, false))), 0L,
      seqCol = Some("seq"), deleteCol = Some("op_del"))
    assert(state() === Set((1L, "de", 11L), (2L, "fr", 20L)))

    // batch 1: update id=1, insert id=3, tombstone id=2 — fr empties → drops
    AtomicStreamSink.upsertBatch(root, store, "lang", "id", "cdc",
      cdc(Seq((1L, "de", 12L, 6L, false), (3L, "de", 30L, 7L, false),
        (2L, "fr", 0L, 8L, true))), 1L,
      seqCol = Some("seq"), deleteCol = Some("op_del"))
    assert(state() === Set((1L, "de", 12L), (3L, "de", 30L)))
    assert(AtomicCommit.readManifest(store).get.entries.keySet === Set("de"),
      "the tombstone-emptied partition must leave the manifest")

    // replay of batch 1 (at-least-once) is a no-op
    AtomicStreamSink.upsertBatch(root, store, "lang", "id", "cdc",
      cdc(Seq((1L, "de", 12L, 6L, false), (3L, "de", 30L, 7L, false),
        (2L, "fr", 0L, 8L, true))), 1L,
      seqCol = Some("seq"), deleteCol = Some("op_del"))
    assert(state() === Set((1L, "de", 12L), (3L, "de", 30L)))
    assert(AtomicStreamSink.lastBatchId(store, "cdc") === Some(1L))

    // within one batch, a key's tombstone then re-insert resolves by seq:
    // the LATER insert wins over the earlier delete
    AtomicStreamSink.upsertBatch(root, store, "lang", "id", "cdc",
      cdc(Seq((1L, "de", 0L, 9L, true), (1L, "de", 99L, 10L, false))), 2L,
      seqCol = Some("seq"), deleteCol = Some("op_del"))
    assert(state() === Set((1L, "de", 99L), (3L, "de", 30L)))
  }

  test("CDC-apply bootstrap: tombstones against a missing table are a harmless no-op") {
    val root = freshRoot()
    val store = new InMemoryObjectStore
    AtomicStreamSink.upsertBatch(root, store, "lang", "id", "cdc",
      Seq((1L, "de", 0L, 1L, true)).toDF("id", "lang", "score", "seq", "op_del"),
      0L, seqCol = Some("seq"), deleteCol = Some("op_del"))
    assert(AtomicCommit.readManifest(store).isEmpty)
  }

  test("end-to-end: file-source query with checkpoint restart lands every row exactly once") {
    val in = Files.createTempDirectory("graft_ass_in").toString
    val ckpt = Files.createTempDirectory("graft_ass_ckpt").toString
    val root = freshRoot()
    val store = new PosixManifestStore(root)

    def land(ids: Range): Unit =
      ids.map(i => (i.toLong, if (i % 2 == 0) "de" else "fr")).toDF("id", "lang")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, lang STRING")
        .parquet(in)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(AtomicStreamSink.exactlyOnce(root, "lang", "ingest"))
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
      q.exception.foreach(throw _)
    }

    land(0 until 100)
    runOnce()
    assert(AtomicCommit.read(spark, root).count() === 100L)

    // query down; late files land; SAME checkpoint resumes
    land(100 until 150)
    runOnce()
    val sink = AtomicCommit.read(spark, root)
    assert(sink.count() === 150L, "restart re-delivered or dropped rows")
    assert(sink.select("id").distinct().count() === 150L)
    assert(sink.filter(col("lang") === "de").count() === 75L)

    // a third run with nothing new commits nothing
    val vBefore = AtomicCommit.currentVersion(root)
    runOnce()
    assert(AtomicCommit.currentVersion(root) === vBefore)
    assert(AtomicCommit.read(spark, root).count() === 150L)
  }
}
