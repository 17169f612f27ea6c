package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Deletes, InMemoryObjectStore, ManifestStore}
import graft.streaming.AtomicStreamSink

/** Regression proofs for the r13 concurrency fixes — each test injects a
  * CONCURRENT COMMIT into the precise window the r12 code left open, via a
  * [[TriggerStore]] that fires a side-effect on the Nth manifest listing
  * (every `readManifest` walk starts with `list()`, so call counts address
  * the protocol's internal steps deterministically, no sleeps or races):
  *
  *  1. Read-set anchoring: a delete/merge records its base owners from the
  *     manifest its DATA was read from, so a commit landing between the
  *     matching scan and the publish ABORTS the rewrite with
  *     [[AtomicCommit.PartitionConflictException]] instead of silently
  *     overwriting the concurrent rows (the r12 code re-read the manifest
  *     at stage time, anchoring the read set AFTER the window).
  *  2. Commit-time exactly-once: the streaming watermark re-validates
  *     inside the publish CAS loop — two writers replaying one batchId
  *     (zombie driver racing its failover replacement) commit the batch
  *     exactly once, even when both pass the pre-stage fast-path check.
  */
class ReadSetAnchorSpec extends SparkSpec {
  import spark.implicits._

  /** Delegating [[ManifestStore]] that runs `effect` once, immediately
    * before the `triggerOnListCall`-th `list()` reaches the underlying
    * store. Effects commit through `underlying` directly, so they are
    * invisible to the call counter.
    */
  private final class TriggerStore(val underlying: ManifestStore,
                                   triggerOnListCall: Int,
                                   effect: () => Unit) extends ManifestStore {
    private var calls = 0
    private var fired = false
    override def list(): Seq[String] = synchronized {
      calls += 1
      if (calls == triggerOnListCall && !fired) { fired = true; effect() }
      underlying.list()
    }
    override def putIfAbsent(name: String, body: Array[Byte]): Boolean =
      underlying.putIfAbsent(name, body)
    override def get(name: String): Option[Array[Byte]] = underlying.get(name)
    override def delete(name: String): Unit = underlying.delete(name)
    def firedOnce: Boolean = fired
  }

  private def seed(root: String, store: ManifestStore): Long =
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, "base1"), ("a", 2L, "base2"), ("b", 3L, "base3"))
        .toDF("p", "k", "v"),
      "p", 1)

  test("delete aborts when a concurrent append lands between its scan and its publish") {
    val root = Files.createTempDirectory("graft_rsa_del").toString
    val inner = new InMemoryObjectStore
    seed(root, inner)
    // deleteWhere's manifest walk is list call 1; publish's validation
    // walk is call 2 (stage anchors at the passed base, no walk of its
    // own) — the concurrent append lands right before publish validates,
    // i.e. AFTER the delete computed its survivors from the old snapshot
    val store = new TriggerStore(inner, 2, () => {
      AtomicCommit.commitAppendPartitions(spark, root, inner,
        Seq(("a", 99L, "concurrent")).toDF("p", "k", "v"), "p", 1)
    })
    val ex = intercept[AtomicCommit.PartitionConflictException] {
      Deletes.deleteWhere(spark, root, store, col("k") === 1L, Nil)
    }
    assert(ex.getMessage.contains("a"))
    assert(store.firedOnce, "the concurrent commit never fired — the test is addressing the wrong window")
    // nothing was lost and nothing was deleted: the concurrent append is
    // visible, the would-be-deleted row survives (the delete aborted whole)
    val rows = AtomicCommit.read(spark, root, inner)
      .select("k").as[Long].collect().toSet
    assert(rows === Set(1L, 2L, 3L, 99L))
  }

  test("streaming upsert batch aborts on a concurrent commit, then replays cleanly") {
    val root = Files.createTempDirectory("graft_rsa_ups").toString
    val inner = new InMemoryObjectStore
    seed(root, inner)
    // upsertBatch walks: watermark fast-path (1), read-set anchor (2),
    // publish validation (3) — inject at 3: after the merge read the base
    val store = new TriggerStore(inner, 3, () => {
      AtomicCommit.commitAppendPartitions(spark, root, inner,
        Seq(("a", 99L, "concurrent")).toDF("p", "k", "v"), "p", 1)
    })
    val batch = Seq(("a", 1L, "updated")).toDF("p", "k", "v")
    intercept[AtomicCommit.PartitionConflictException] {
      AtomicStreamSink.upsertBatch(root, store, "p", "k", "q", batch, 0L)
    }
    assert(store.firedOnce)
    // the engine's contract: the failed batch is REPLAYED against the
    // refreshed snapshot; the retry must merge the concurrent row in
    AtomicStreamSink.upsertBatch(root, inner, "p", "k", "q", batch, 0L)
    val got = AtomicCommit.read(spark, root, inner)
      .select("k", "v").as[(Long, String)].collect().toMap
    assert(got === Map(1L -> "updated", 2L -> "base2", 3L -> "base3",
      99L -> "concurrent"))
    assert(AtomicStreamSink.lastBatchId(inner, "q") === Some(0L))
  }

  test("zombie replay: two publishes of one batchId commit exactly once (append)") {
    val root = Files.createTempDirectory("graft_rsa_zomb").toString
    val store = new InMemoryObjectStore
    seed(root, store)
    val wm = "graft.stream.q.lastBatchId"
    val batch = Seq(("a", 50L, "batch5")).toDF("p", "k", "v")
    // both zombies staged the same batch (both passed the pre-check
    // before either committed) — only the first CAS may land it
    val s1 = AtomicCommit.stage(spark, root, store, batch, "p", 1)
      .copy(props = Map(wm -> "5"))
    val s2 = AtomicCommit.stage(spark, root, store, batch, "p", 1)
      .copy(props = Map(wm -> "5"))
    assert(AtomicCommit.publishAppendIfNew(root, store, s1, Set(wm)).nonEmpty)
    assert(AtomicCommit.publishAppendIfNew(root, store, s2, Set(wm)).isEmpty,
      "the replayed batch committed twice")
    val n = AtomicCommit.read(spark, root, store)
      .filter(col("k") === 50L).count()
    assert(n === 1L, s"batch rows appear $n times")
    // a LATER batch still advances past the watermark
    val s3 = AtomicCommit.stage(spark, root, store,
      Seq(("a", 60L, "batch6")).toDF("p", "k", "v"), "p", 1)
      .copy(props = Map(wm -> "6"))
    assert(AtomicCommit.publishAppendIfNew(root, store, s3, Set(wm)).nonEmpty)
  }

  test("zombie replay through commitBatch: the CAS-loop guard catches what the fast path cannot") {
    val root = Files.createTempDirectory("graft_rsa_cb").toString
    val inner = new InMemoryObjectStore
    seed(root, inner)
    val batch = Seq(("a", 70L, "batch7")).toDF("p", "k", "v")
    // commitBatch walks: fast-path (1), stage (2), publish (3). The rival
    // zombie commits the SAME batchId right before this writer's publish
    // validation — past the fast path, so only the in-loop guard can save it
    val store = new TriggerStore(inner, 3, () => {
      AtomicStreamSink.commitBatch(root, inner, "p", "rq", batch, 7L)
    })
    AtomicStreamSink.commitBatch(root, store, "p", "rq", batch, 7L)
    assert(store.firedOnce)
    val n = AtomicCommit.read(spark, root, inner)
      .filter(col("k") === 70L).count()
    assert(n === 1L, s"batch rows appear $n times — the replay double-committed")
    assert(AtomicStreamSink.lastBatchId(inner, "rq") === Some(7L))
  }

  test("constraint added between stage and publish aborts the writer (metadata-change conflict)") {
    val root = Files.createTempDirectory("graft_rsa_constraint").toString
    val inner = new InMemoryObjectStore
    seed(root, inner)
    // commitAppendPartitions walks: stage's manifest read is list call 1;
    // publish's CAS validation is call 2 — addConstraint lands in exactly
    // the window where the staged rows were validated under a rule set
    // (none) that is no longer THE rules. Without the commit-time check
    // the violating row would land unvalidated: addConstraint's own
    // full-table scan cannot see an unpublished generation either.
    val store = new TriggerStore(inner, 2, () => {
      AtomicCommit.addConstraint(spark, root, inner, "nonneg", "k >= 0")
    })
    val batch = Seq(("a", -5L, "violates")).toDF("p", "k", "v")
    val ex = intercept[AtomicCommit.PartitionConflictException] {
      AtomicCommit.commitAppendPartitions(spark, root, store, batch, "p", 1)
    }
    assert(ex.getMessage.contains("constraints"))
    assert(store.firedOnce,
      "the concurrent addConstraint never fired — the test is addressing the wrong window")
    // nothing slipped through
    assert(!AtomicCommit.read(spark, root, inner).select("k").as[Long]
      .collect().contains(-5L))
    // the abort contract: re-stage under the fresh rules — which NOW
    // validate the rows and reject the violator outright
    intercept[AtomicCommit.ConstraintViolationException] {
      AtomicCommit.commitAppendPartitions(spark, root, inner, batch, "p", 1)
    }
    // a conforming batch passes under the new rule
    AtomicCommit.commitAppendPartitions(spark, root, inner,
      Seq(("a", 100L, "ok")).toDF("p", "k", "v"), "p", 1)
    assert(AtomicCommit.read(spark, root, inner)
      .select("k").as[Long].collect().toSet === Set(1L, 2L, 3L, 100L))
  }

  test("diff of identical versions returns the documented schema, empty") {
    val root = Files.createTempDirectory("graft_rsa_diff").toString
    val store = new InMemoryObjectStore
    val v = seed(root, store)
    val d = AtomicCommit.diff(spark, root, store, v, v, "k")
    // data columns first (file order), partition column last (appended by
    // partition discovery) — the same order a non-empty diff carries
    assert(d.columns.toSeq === Seq("change_type", "k", "v_from", "v_to",
      "p_from", "p_to"))
    assert(d.count() === 0L)
    // and the empty result is selectable the way a consumer would use it
    assert(d.filter(col("change_type") === "insert").select("k", "v_to")
      .count() === 0L)
  }
}
