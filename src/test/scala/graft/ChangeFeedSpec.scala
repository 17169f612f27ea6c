package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Deletes, InMemoryObjectStore}
import graft.streaming.{AtomicStreamSink, ChangeFeed}

/** [[graft.streaming.ChangeFeed]] — the read half of the change-feed loop:
  * a destination table subscribes to a source table's committed versions
  * and applies them exactly once, surviving replays and restarts, with the
  * destination's own manifest props as the only checkpoint.
  */
class ChangeFeedSpec extends SparkSpec {
  import spark.implicits._

  private def snapshot(root: String, store: InMemoryObjectStore): Set[(String, Long, String)] =
    AtomicCommit.read(spark, root, store)
      .select("p", "k", "v").as[(String, Long, String)].collect().toSet

  test("append feed: committed batches appear downstream exactly once, replay-proof") {
    val srcRoot = Files.createTempDirectory("graft_cf_src").toString
    val dstRoot = Files.createTempDirectory("graft_cf_dst").toString
    val src = new InMemoryObjectStore
    val dst = new InMemoryObjectStore
    // v1: initial snapshot; v2, v3: streaming appends through the sink
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1"), ("b", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "ingest",
      Seq(("a", 3L, "r3")).toDF("p", "k", "v"), 0L)
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "ingest",
      Seq(("c", 4L, "r4")).toDF("p", "k", "v"), 1L)

    val covered = ChangeFeed.replicateAppends(spark, srcRoot, src,
      dstRoot, dst, "feed1")
    assert(covered === 3L)
    assert(snapshot(dstRoot, dst) === snapshot(srcRoot, src))
    assert(ChangeFeed.lastSourceVersion(dst, "feed1") === Some(3L))

    // an idle tick applies nothing (no version burn, no duplicate rows)
    val dstVer = AtomicCommit.currentVersion(dst).get
    assert(ChangeFeed.replicateAppends(spark, srcRoot, src,
      dstRoot, dst, "feed1") === 3L)
    assert(AtomicCommit.currentVersion(dst).get === dstVer)

    // a crashed consumer restarts from scratch: the destination's props
    // ARE the checkpoint, so the full replay is a no-op
    assert(ChangeFeed.replicateAppends(spark, srcRoot, src,
      dstRoot, dst, "feed1") === 3L)
    assert(snapshot(dstRoot, dst) === snapshot(srcRoot, src))
    assert(AtomicCommit.read(spark, dstRoot, dst).count() === 4L)

    // new source commits flow through incrementally on the next tick
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "ingest",
      Seq(("a", 5L, "r5")).toDF("p", "k", "v"), 2L)
    assert(ChangeFeed.replicateAppends(spark, srcRoot, src,
      dstRoot, dst, "feed1") === 4L)
    assert(snapshot(dstRoot, dst) === snapshot(srcRoot, src))
  }

  test("append feed refuses non-append history with a pointer to the CDC feed") {
    val srcRoot = Files.createTempDirectory("graft_cf_rep").toString
    val src = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1")).toDF("p", "k", "v"), "p", 1)
    // v2 REPLACES partition a — not expressible as insert-only rows
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1-edited")).toDF("p", "k", "v"), "p", 1)
    val ex = intercept[RuntimeException] {
      ChangeFeed.appendsAt(spark, srcRoot, src, 2L)
    }
    assert(ex.getMessage.contains("CDC feed"))
  }

  test("CDC feed: inserts, updates, and deletes mirror the source through restarts") {
    val srcRoot = Files.createTempDirectory("graft_cf_cdcs").toString
    val dstRoot = Files.createTempDirectory("graft_cf_cdcd").toString
    val src = new InMemoryObjectStore
    val dst = new InMemoryObjectStore
    // v1 snapshot
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1"), ("a", 2L, "r2"), ("b", 3L, "r3"))
        .toDF("p", "k", "v"), "p", 1)
    // v2: upsert (update k=1, insert k=4) through the CDC-apply sink
    AtomicStreamSink.upsertBatch(srcRoot, src, "p", "k", "w",
      Seq(("a", 1L, "r1-v2"), ("b", 4L, "r4")).toDF("p", "k", "v"), 0L)
    // v3: row-level delete of k=2
    Deletes.deleteWhere(spark, srcRoot, src, col("k") === 2L, Nil)

    assert(ChangeFeed.replicateCdc(spark, srcRoot, src, dstRoot, dst,
      "cdcfeed", "k") === 3L)
    assert(snapshot(dstRoot, dst) === snapshot(srcRoot, src))
    assert(snapshot(dstRoot, dst).map(_._2) === Set(1L, 3L, 4L))

    // replay from scratch: everything already applied → no-op
    val dstVer = AtomicCommit.currentVersion(dst).get
    assert(ChangeFeed.replicateCdc(spark, srcRoot, src, dstRoot, dst,
      "cdcfeed", "k") === 3L)
    assert(AtomicCommit.currentVersion(dst).get === dstVer)

    // v4 empties partition b entirely — the drop must propagate
    Deletes.deleteWhere(spark, srcRoot, src,
      col("k") === 3L || col("k") === 4L, Nil)
    assert(ChangeFeed.replicateCdc(spark, srcRoot, src, dstRoot, dst,
      "cdcfeed", "k") === 4L)
    assert(snapshot(dstRoot, dst) === snapshot(srcRoot, src))
    assert(AtomicCommit.readManifest(dst).get.entries.keySet === Set("a"))
  }

  test("CDC batch shape: row versions plus tombstones, the sink's input contract") {
    val srcRoot = Files.createTempDirectory("graft_cf_shape").toString
    val src = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1"), ("a", 2L, "r2")).toDF("p", "k", "v"), "p", 1)
    Deletes.deleteWhere(spark, srcRoot, src, col("k") === 2L, Nil)
    val batch = ChangeFeed.cdcBatchAt(spark, srcRoot, src, 2L, "k").get
    val got = batch.select(col("k"), col("v"), col("__cf_tombstone"))
      .as[(Long, String, Boolean)].collect().toSet
    assert(got === Set((2L, "r2", true)), "the deleted key's last row, tombstoned")
    // version 1 is the initial snapshot, all live
    val first = ChangeFeed.cdcBatchAt(spark, srcRoot, src, 1L, "k").get
    assert(first.filter(col("__cf_tombstone")).count() === 0L)
    assert(first.count() === 2L)
  }

  test("incremental aggregate view: ticks recompute only changed partitions") {
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum}
    val srcRoot = Files.createTempDirectory("graft_cf_mvs").toString
    val dstRoot = Files.createTempDirectory("graft_cf_mvd").toString
    val src = new InMemoryObjectStore
    val dst = new InMemoryObjectStore
    def agg(df: org.apache.spark.sql.DataFrame) =
      df.groupBy("p").agg(fcount(flit(1)).as("n"), fsum("k").as("sk"))
    def viewRows(): Map[String, (Long, Long)] =
      AtomicCommit.read(spark, dstRoot, dst)
        .select("p", "n", "sk").as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
    def expect(): Map[String, (Long, Long)] =
      agg(AtomicCommit.read(spark, srcRoot, src))
        .select("p", "n", "sk").as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap

    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1"), ("a", 2L, "r2"), ("b", 3L, "r3"))
        .toDF("p", "k", "v"), "p", 1)
    // initial materialization covers everything
    ChangeFeed.syncAggregate(spark, srcRoot, src, dstRoot, dst, "mv")(agg)
    assert(viewRows() === expect())
    val aOwner = AtomicCommit.readManifest(dst).get.entries("a")
    val bOwner = AtomicCommit.readManifest(dst).get.entries("b")

    // append touches only partition b → the tick must leave a's view
    // generation untouched (the O(changed) proof at manifest level)
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "in",
      Seq(("b", 10L, "r10")).toDF("p", "k", "v"), 0L)
    ChangeFeed.syncAggregate(spark, srcRoot, src, dstRoot, dst, "mv")(agg)
    assert(viewRows() === expect())
    val m2 = AtomicCommit.readManifest(dst).get
    assert(m2.entries("a") === aOwner, "partition a was needlessly rewritten")
    assert(m2.entries("b") !== bOwner)

    // idle tick: no new source version → no view commit
    val dv = AtomicCommit.currentVersion(dst).get
    ChangeFeed.syncAggregate(spark, srcRoot, src, dstRoot, dst, "mv")(agg)
    assert(AtomicCommit.currentVersion(dst).get === dv)

    // deleting all of partition a from the source drops it from the view
    Deletes.deleteWhere(spark, srcRoot, src, col("p") === "a", Nil)
    ChangeFeed.syncAggregate(spark, srcRoot, src, dstRoot, dst, "mv")(agg)
    assert(viewRows() === expect())
    assert(AtomicCommit.readManifest(dst).get.entries.keySet === Set("b"))

    // an agg that groups ACROSS partitions is rejected loudly
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "in",
      Seq(("b", 11L, "r11")).toDF("p", "k", "v"), 1L)
    intercept[IllegalArgumentException] {
      ChangeFeed.syncAggregate(spark, srcRoot, src, dstRoot, dst, "mv")(
        df => df.withColumn("p", flit("GLOBAL"))
          .groupBy("p").agg(fcount(flit(1)).as("n"), fsum("k").as("sk")))
    }
  }

  test("the maintenance tick rides the batch face: partition-keyed re-aggregation plans exchange-free") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val srcRoot = Files.createTempDirectory("graft_cf_face_s").toString
    val dstRoot = Files.createTempDirectory("graft_cf_face_d").toString
    AtomicCommit.commitReplacePartitions(spark, srcRoot,
      (0 until 30).map(i => (s"p${i % 3}", i.toLong, s"r$i"))
        .toDF("p", "k", "v"), "p")
    var captured: org.apache.spark.sql.DataFrame = null
    def agg(df: org.apache.spark.sql.DataFrame) = {
      val out = df.groupBy("p").agg(fcount(flit(1)).as("n"), fsum("k").as("sk"))
      captured = out
      out
    }
    def viewRows(): Map[String, (Long, Long)] =
      AtomicCommit.read(spark, dstRoot).select("p", "n", "sk")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    def expect(): Map[String, (Long, Long)] = // own aggregate: must not
      // touch `captured` (agg would overwrite the tick's frame)
      AtomicCommit.read(spark, srcRoot).groupBy("p")
        .agg(fcount(flit(1)).as("n"), fsum("k").as("sk")).select("p", "n", "sk")
        .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap

    withSQLConf(graft.sources.GraftBatchScan.EnabledConf -> "true") {
      ChangeFeed.syncAggregate(spark, srcRoot, dstRoot, "mvf")(agg)
      assert(viewRows() === expect(), "face-served tick diverged")
      // re-execute the tick's aggregate frame: the slice reads on the
      // batch face and the partition-keyed aggregate needs NO exchange
      // below it (KeyGroupedPartitioning serves the grouping)
      captured.collect()
      val plan = captured.queryExecution.executedPlan
      assert(nodes(plan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]),
        s"the tick's slice must read on the batch face\n$plan")
      assert(nodes(plan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) === 0,
        s"the partition-keyed tick aggregate must not exchange\n$plan")

      // a steady-state tick (one changed partition) keeps the shape
      AtomicStreamSink.commitBatch(srcRoot,
        new graft.sources.PosixManifestStore(srcRoot), "p", "in",
        Seq(("p1", 100L, "r100")).toDF("p", "k", "v"), 0L)
      ChangeFeed.syncAggregate(spark, srcRoot, dstRoot, "mvf")(agg)
      assert(viewRows() === expect(), "steady-state face tick diverged")
      captured.collect()
      val plan2 = captured.queryExecution.executedPlan
      assert(nodes(plan2).count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) === 0,
        s"the steady-state tick must not exchange\n$plan2")
    }
    // face off: same answers through the V1 composition (the fallback
    // is the same code path scanManifest always was)
    AtomicStreamSink.commitBatch(srcRoot,
      new graft.sources.PosixManifestStore(srcRoot), "p", "in",
      Seq(("p2", 200L, "r200")).toDF("p", "k", "v"), 1L)
    ChangeFeed.syncAggregate(spark, srcRoot, dstRoot, "mvf")(agg)
    assert(viewRows() === expect(), "V1 tick diverged after face ticks")
  }

  test("hidden-partitioned sources: the day-grain tick aggregates exchange-free (identity face — the derived column is projected, so the transform face correctly stands down)") {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.functions.{count => fcount, lit => flit, sum => fsum, to_timestamp, col => fcol}
    def nodes(p: SparkPlan): Seq[SparkPlan] = {
      val kids = p match {
        case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
        case q: QueryStageExec => Seq(q.plan)
        case other => other.children
      }
      p +: kids.flatMap(nodes)
    }
    val srcRoot = Files.createTempDirectory("graft_cf_hp_s").toString
    val dstRoot = Files.createTempDirectory("graft_cf_hp_d").toString
    val rows = (0 until 30).map(i =>
      (i.toLong, f"2024-06-${(i % 3) + 1}%02dT${i % 24}%02d:00:00Z"))
      .toDF("k", "iso")
      .select(fcol("k"), to_timestamp(fcol("iso")).as("ts"))
    graft.sources.HiddenPartitioning.commitReplace(spark, srcRoot, rows,
      graft.sources.HiddenPartitioning.Days("ts"))
    val pc = AtomicCommit.readManifest(srcRoot).get.partitionCol
    var captured: org.apache.spark.sql.DataFrame = null
    def agg(df: org.apache.spark.sql.DataFrame) = {
      val out = df.groupBy(pc).agg(fcount(flit(1)).as("n"), fsum("k").as("sk"))
      captured = out
      out
    }
    // the graft catalog registered: the tick threads it into the slice
    // relation (needed only when a subscriber resolves a TRANSFORM
    // grouping; the identity face here must stay exchange-free with or
    // without it)
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    try withSQLConf(graft.sources.GraftBatchScan.EnabledConf -> "true") {
      ChangeFeed.syncAggregate(spark, srcRoot, dstRoot, "mvh")(agg)
      val got = AtomicCommit.read(spark, dstRoot).select(pc, "n", "sk")
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      val exp = AtomicCommit.read(spark, srcRoot).groupBy(pc)
        .agg(fcount(flit(1)).as("n"), fsum("k").as("sk"))
        .select(fcol(pc).cast("string"), fcol("n"), fcol("sk"))
        .as[(String, Long, Long)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got === exp, "hidden-partitioned face tick diverged")
      captured.collect()
      val plan = captured.queryExecution.executedPlan
      assert(nodes(plan).exists(
        _.isInstanceOf[org.apache.spark.sql.execution.datasources.v2.BatchScanExec]),
        s"the tick's slice must read on the batch face\n$plan")
      assert(nodes(plan).count(
        _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeExec]) === 0,
        s"the day-keyed tick aggregate must not exchange\n$plan")
    } finally spark.conf.unset("spark.sql.catalog.graft")
  }

  test("a consumer lagging past the vacuum horizon fails loudly, never skips silently") {
    val srcRoot = Files.createTempDirectory("graft_cf_vac").toString
    val dstRoot = Files.createTempDirectory("graft_cf_vacd").toString
    val src = new InMemoryObjectStore
    val dst = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1")).toDF("p", "k", "v"), "p", 1)
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "in",
      Seq(("a", 2L, "r2")).toDF("p", "k", "v"), 0L)
    AtomicStreamSink.commitBatch(srcRoot, src, "p", "in",
      Seq(("a", 3L, "r3")).toDF("p", "k", "v"), 1L)
    // retention 1 drops v1/v2 manifests — a consumer at watermark 0 now
    // cannot derive v1's batch
    AtomicCommit.vacuum(srcRoot, src, 0L, 1)
    val ex = intercept[RuntimeException] {
      ChangeFeed.replicateAppends(spark, srcRoot, src, dstRoot, dst, "late")
    }
    assert(ex.getMessage.contains("v1"))
  }

  test("trailing props-only source versions advance the watermark; vacuum cannot strand the feed") {
    val srcRoot = Files.createTempDirectory("graft_cf_noop_src").toString
    val dstRoot = Files.createTempDirectory("graft_cf_noop_dst").toString
    val src = new InMemoryObjectStore
    val dst = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      Seq(("a", 1L, "r1")).toDF("p", "k", "v"), "p", 1)
    ChangeFeed.replicateAppends(spark, srcRoot, src, dstRoot, dst, "noop")
    assert(ChangeFeed.lastSourceVersion(dst, "noop") === Some(1L))
    // v2, v3: props-only source commits — no batch derivable from them
    AtomicCommit.tag(srcRoot, src, "x", 1L)
    AtomicCommit.untag(srcRoot, src, "x")
    ChangeFeed.replicateAppends(spark, srcRoot, src, dstRoot, dst, "noop")
    // the fix under test: the recorded lag must not extend past history
    // the consumer has fully applied (nothing in v2/v3 to apply)
    assert(ChangeFeed.lastSourceVersion(dst, "noop") === Some(3L))
    // the no-op versions age past the source's vacuum horizon...
    AtomicCommit.vacuum(srcRoot, src, 0L, 1)
    assert(AtomicCommit.versions(src) === Seq(3L))
    // ...and the next tick neither fails on their missing manifests nor
    // changes the replica
    ChangeFeed.replicateAppends(spark, srcRoot, src, dstRoot, dst, "noop")
    assert(snapshot(dstRoot, dst) === Set(("a", 1L, "r1")))
  }
}
