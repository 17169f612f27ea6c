package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.sources.{AtomicCommit, Deletes}

/** [[graft.streaming.GraftStreamSource]] — `readStream.format("graft")`:
  * manifest versions as offsets. Pinned: every committed version arrives
  * as exactly one micro-batch's worth of rows, a restart from the
  * checkpoint resumes AFTER consumed history (no re-delivery, no skips),
  * the CDC feed carries tombstones from merge-on-read deletes, and a
  * consumer lagging past the source's vacuum horizon fails the QUERY
  * with the readable-versions error instead of silently skipping.
  */
class GraftStreamSourceSpec extends SparkSpec {
  import spark.implicits._

  private def runOnce(root: String, out: String, ckpt: String,
                      feed: String = "append", keyCol: String = ""): Unit = {
    val reader = spark.readStream.format("graft")
      .option("path", root).option("feed", feed)
    val q = (if (keyCol.nonEmpty) reader.option("keyCol", keyCol) else reader)
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    q.exception.foreach(throw _)
  }

  test("append feed: commits become micro-batches; checkpoint restart resumes exactly") {
    val root = Files.createTempDirectory("graft_ss").toString
    val out = Files.createTempDirectory("graft_ss_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_ss_ck").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A"), (2L, "B")).toDF("k", "p"), "p")
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "A")).toDF("k", "p"), "p")
    runOnce(root, out, ckpt)
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet ===
      Set(1L, 2L, 3L))

    // query down; more commits land (one data, one props-only no-op)
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((4L, "B")).toDF("k", "p"), "p")
    AtomicCommit.tag(root, "pin", 1L)
    runOnce(root, out, ckpt) // SAME checkpoint
    val sink = spark.read.parquet(out).select("k").as[Long].collect().toSeq
    assert(sink.sorted === Seq(1L, 2L, 3L, 4L),
      "restart re-delivered or dropped committed rows")
    // nothing new: another run is a no-op
    runOnce(root, out, ckpt)
    assert(spark.read.parquet(out).count() === 4L)
  }

  test("cdc feed: downstream sees row versions plus tombstones from MoR deletes") {
    val root = Files.createTempDirectory("graft_ss_cdc").toString
    val out = Files.createTempDirectory("graft_ss_cdc_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_ss_cdc_ck").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A", 10L), (2L, "A", 20L)).toDF("k", "p", "v"), "p")
    runOnce(root, out, ckpt, feed = "cdc", keyCol = "k")
    val snap1 = spark.read.parquet(out)
    assert(snap1.filter(col("__cf_tombstone")).count() === 0L)
    assert(snap1.count() === 2L)

    Deletes.deleteWhereMoR(spark, root, col("k") === 2L)
    runOnce(root, out, ckpt, feed = "cdc", keyCol = "k")
    val all = spark.read.parquet(out)
    assert(all.filter(col("__cf_tombstone")).select("k").as[Long]
      .collect().toSeq === Seq(2L),
      "the MoR delete must surface as exactly one tombstone for k=2")
  }

  test("a consumer past the vacuum horizon fails the query loudly") {
    val root = Files.createTempDirectory("graft_ss_vac").toString
    val out = Files.createTempDirectory("graft_ss_vac_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_ss_vac_ck").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A")).toDF("k", "p"), "p")
    runOnce(root, out, ckpt) // consumed through v1
    // v2 and v3 land; vacuum reaps everything but v3 — the consumer's
    // next range (1, 3] needs v2's manifest, which is gone
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((2L, "A")).toDF("k", "p"), "p")
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "A")).toDF("k", "p"), "p")
    AtomicCommit.vacuum(root, 0L, 1)
    val ex = intercept[Exception] { runOnce(root, out, ckpt) }
    val msg = Option(ex.getMessage).getOrElse("") +
      Option(ex.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("no manifest") || msg.contains("vacuumed"),
      s"expected the readable-versions error, got: $msg")
    // and nothing was silently skipped into the sink
    assert(spark.read.parquet(out).count() === 1L)
  }

  test("maxVersionsPerTrigger bounds catch-up batches without changing contents") {
    val root = Files.createTempDirectory("graft_ss_rate").toString
    val out = Files.createTempDirectory("graft_ss_rate_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_ss_rate_ck").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A")).toDF("k", "p"), "p")
    (2L to 6L).foreach { i =>
      AtomicCommit.commitAppendPartitions(spark, root,
        Seq((i, "A")).toDF("k", "p"), "p")
    }
    // 6 versions of history, at most 2 per trigger: AvailableNow drains
    // through repeated capped triggers
    val q = spark.readStream.format("graft")
      .option("path", root).option("maxVersionsPerTrigger", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(!q.isActive)
    q.exception.foreach(throw _)
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet ===
      (1L to 6L).toSet, "rate limiting must never change batch contents")
    val offsets = java.nio.file.Paths.get(ckpt, "offsets").toFile.listFiles
    assert(offsets != null && offsets.length >= 3,
      s"6 versions at <=2 per trigger must take >=3 batches, " +
        s"saw ${Option(offsets).map(_.length)}")
    // the served mark lives INSIDE the checkpoint (metadataPath is a
    // URI — a regression here strands marks in the process cwd)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(ckpt, "sources", "0", "graft-last-served")),
      "the rate-limit mark must persist in the query's metadata dir")
  }

  test("startingVersion skips history: subscribe-to-new-changes mode") {
    val root = Files.createTempDirectory("graft_ss_sv").toString
    val out = Files.createTempDirectory("graft_ss_sv_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_ss_sv_ck").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A")).toDF("k", "p"), "p") // v1: initial snapshot
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((2L, "A")).toDF("k", "p"), "p") // v2
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "A")).toDF("k", "p"), "p") // v3
    val q = spark.readStream.format("graft")
      .option("path", root).option("startingVersion", "2")
      .load()
      .writeStream.format("parquet")
      .option("path", out).option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    q.exception.foreach(throw _)
    assert(spark.read.parquet(out).select("k").as[Long].collect().toSet ===
      Set(2L, 3L), "v1's snapshot must be skipped, v2..v3 delivered")
  }

  test("startingTimestamp resumes one past the version current at the instant") {
    val root = Files.createTempDirectory("graft_ss_st").toString
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, "A")).toDF("k", "p"), "p") // v1
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((2L, "A")).toDF("k", "p"), "p") // v2
    AtomicCommit.commitAppendPartitions(spark, root,
      Seq((3L, "A")).toDF("k", "p"), "p") // v3
    val store = new graft.sources.PosixManifestStore(root)
    val w2 = AtomicCommit.commitTimeMillis(
      AtomicCommit.manifestAt(store, root, 2L)).get
    def drain(opt: String): Set[Long] = {
      val out = Files.createTempDirectory("graft_ss_st_out").toString + "/s"
      val ckpt = Files.createTempDirectory("graft_ss_st_ck").toString
      val q = spark.readStream.format("graft")
        .option("path", root).option("startingTimestamp", opt).load()
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      q.exception.foreach(throw _)
      spark.read.parquet(out).select("k").as[Long].collect().toSet
    }
    // a reader current at w2 has seen v1+v2 — the stream resumes at v3
    assert(drain(w2.toString) === Set(3L))
    // an instant predating the table streams everything
    assert(drain("2001-01-01 00:00:00") === Set(1L, 2L, 3L))
  }
}
