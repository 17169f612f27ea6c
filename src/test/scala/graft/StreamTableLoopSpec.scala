package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{AtomicCommit, Deletes}
import graft.streaming.AtomicStreamSink

/** The CLOSED LOOP the r14 surfaces compose into: a manifest table feeds
  * a registered streaming source (`readStream.format("graft")`), the
  * query transforms the feed, and an [[AtomicStreamSink]] lands it in a
  * SECOND manifest table exactly once — table → stream → table, restart-
  * proof on BOTH ends (the engine's offset log upstream, the manifest
  * watermark downstream), with a merge-on-read delete flowing through
  * the CDC feed as a tombstone that the sink applies as a real delete.
  * This is the always-on derived-table story at 100 TB: each tick costs
  * O(committed changes), no consumer state outside the two tables.
  */
class StreamTableLoopSpec extends SparkSpec {
  import spark.implicits._

  test("table -> registered stream -> transformed exactly-once table, with CDC deletes") {
    val src = Files.createTempDirectory("graft_loop_src").toString
    val dst = Files.createTempDirectory("graft_loop_dst").toString
    val ckpt = Files.createTempDirectory("graft_loop_ck").toString
    val dstStore = new graft.sources.PosixManifestStore(dst)

    def runOnce(): Unit = {
      val q = spark.readStream.format("graft")
        .option("path", src).option("feed", "cdc").option("keyCol", "k")
        .load()
        .withColumn("v2", col("v") * 2)
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch(AtomicStreamSink.exactlyOnceUpsert(dst, dstStore,
          partitionCol = "p", keyCol = "k", queryKey = "loop",
          deleteCol = Some("__cf_tombstone")))
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    def dstRows(): Set[(Long, Long)] =
      AtomicCommit.read(spark, dst).select("k", "v2")
        .as[(Long, Long)].collect().toSet

    // v1: initial snapshot flows through with the transform applied
    AtomicCommit.commitReplacePartitions(spark, src,
      Seq((1L, 10L, "A"), (2L, 20L, "B")).toDF("k", "v", "p"), "p")
    runOnce()
    assert(dstRows() === Set((1L, 20L), (2L, 40L)))

    // stream down; an append, a MoR delete, and an update land upstream
    AtomicCommit.commitAppendPartitions(spark, src,
      Seq((3L, 30L, "A")).toDF("k", "v", "p"), "p")
    Deletes.deleteWhereMoR(spark, src, col("k") === 2L)
    runOnce() // SAME checkpoint: only versions 2..3 replay
    assert(dstRows() === Set((1L, 20L), (3L, 60L)),
      "append arrived transformed, the MoR delete arrived as a real delete")

    // replays are no-ops end to end: the engine replays nothing (offset
    // log) and even a forced duplicate batch dies on the sink watermark
    runOnce()
    assert(dstRows() === Set((1L, 20L), (3L, 60L)))
    val wm = AtomicStreamSink.lastBatchId(dstStore, "loop")
    assert(wm.nonEmpty, "the destination carries the loop's watermark")

    // the destination is itself a manifest table: time travel shows the
    // pre-delete derived state
    val versions = AtomicCommit.versions(dst)
    assert(AtomicCommit.readAt(spark, dst, versions.head)
      .select("k").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("zero-plumbing loop: readStream.format(graft) into writeStream.format(graft)") {
    val src = Files.createTempDirectory("graft_loop2_src").toString
    val dst = Files.createTempDirectory("graft_loop2_dst").toString
    val ckpt = Files.createTempDirectory("graft_loop2_ck").toString
    def runOnce(): Unit = {
      val q = spark.readStream.format("graft").option("path", src)
        .load()
        .withColumn("v2", col("v") * 10)
        .writeStream.format("graft")
        .option("path", dst).option("partitionCol", "p")
        .option("queryKey", "loop2").option("statsCols", "v2")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
    }
    AtomicCommit.commitReplacePartitions(spark, src,
      Seq((1L, 1L, "A"), (2L, 2L, "B")).toDF("k", "v", "p"), "p")
    runOnce()
    assert(AtomicCommit.read(spark, dst).select("k", "v2")
      .as[(Long, Long)].collect().toSet === Set((1L, 10L), (2L, 20L)))
    // stream down; a source append lands; restart replays exactly once
    AtomicCommit.commitAppendPartitions(spark, src,
      Seq((3L, 3L, "A")).toDF("k", "v", "p"), "p")
    runOnce()
    runOnce() // and a third run is a no-op end to end
    assert(AtomicCommit.read(spark, dst).select("k", "v2")
      .as[(Long, Long)].collect().toSet ===
      Set((1L, 10L), (2L, 20L), (3L, 30L)))
    // the sink's commits are true appends with skipping evidence attached
    val m = AtomicCommit.readManifest(dst).get
    assert(AtomicCommit.ownersOf(m.entries("A")).size === 2)
    val gen = AtomicCommit.ownersOf(m.entries("A")).head
    assert(graft.sources.DataSkipping.readStats(dst, gen).nonEmpty,
      "statsCols must annotate sink-committed generations")
  }
}
