package graft

import java.nio.file.Files

import graft.sources.{AtomicCommit, InMemoryObjectStore, ManifestStore, PosixManifestStore, Transactions}
import graft.sources.AtomicCommit.Staged
import graft.sources.Transactions.{Participant, TxnAbortedException}
import graft.streaming.ChangeFeed

/** Multi-table transactions ([[Transactions]]): cooperative two-phase
  * commit built on the manifest CAS. The tests drive every protocol
  * state — atomic visibility, abort-with-revert on conflict, reader
  * snapshot isolation under an undecided transaction, a concurrent
  * writer force-aborting a stalled coordinator, the decided-but-
  * unfinalized crash window, a version-1 abort deleting the table,
  * object-store primitives only, change feeds across an abort pair, and
  * vacuum's decision-object GC.
  */
class TransactionsSpec extends SparkSpec {
  import spark.implicits._

  override def beforeAll(): Unit = {
    super.beforeAll()
    Transactions.undecidedGraceMillis = 0L // deterministic force-aborts
  }

  private def seed(root: String, store: ManifestStore,
                   tag: String): Long =
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Seq(("a", 1L, s"$tag-a"), ("b", 2L, s"$tag-b")).toDF("p", "k", "v"),
      "p", 1)

  private def rows(root: String, store: ManifestStore): Set[(String, Long, String)] =
    AtomicCommit.read(spark, root, store).select("p", "k", "v")
      .as[(String, Long, String)].collect().toSet

  private def stageReplace(root: String, store: ManifestStore,
                           data: Seq[(String, Long, String)]): Staged =
    AtomicCommit.stage(spark, root, store, data.toDF("p", "k", "v"), "p", 1)

  test("two-table transaction commits atomically; markers seal away") {
    val rootA = Files.createTempDirectory("graft_txn_a").toString
    val rootB = Files.createTempDirectory("graft_txn_b").toString
    val (sa, sb) = (new PosixManifestStore(rootA), new PosixManifestStore(rootB))
    seed(rootA, sa, "base"); seed(rootB, sb, "base")
    val versions = Transactions.commitAll(Seq(
      Participant(rootA, sa, stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))),
      Participant(rootB, sb, stageReplace(rootB, sb, Seq(("b", 20L, "txn-b"))))))
    assert(versions.keySet === Set(rootA, rootB))
    assert(rows(rootA, sa)("a", 10L, "txn-a"))
    assert(rows(rootB, sb)("b", 20L, "txn-b"))
    // untouched partitions survived
    assert(rows(rootA, sa)("b", 2L, "base-b"))
    // the seal stripped the txn markers from both heads
    Seq(sa, sb).foreach { s =>
      val head = AtomicCommit.readManifest(s).get
      assert(!head.props.keys.exists(_.startsWith(Transactions.TxnPrefix)))
    }
    // the decision object (in the first-sorted participant's store)
    // records commit; the pending manifest still names the txn
    val txnId = AtomicCommit.manifestAt(sa, rootA, versions(rootA))
      .props(Transactions.IdKey)
    val d = (if (rootA < rootB) sa else sb)
      .get(Transactions.decisionName(txnId))
    assert(d.exists(b => new String(b).contains("\"commit\"")))
  }

  test("a conflicting concurrent commit aborts the whole transaction") {
    val rootA = Files.createTempDirectory("graft_txn_ca").toString
    val rootB = Files.createTempDirectory("graft_txn_cb").toString
    val (sa, sb) = (new PosixManifestStore(rootA), new PosixManifestStore(rootB))
    seed(rootA, sa, "base"); seed(rootB, sb, "base")
    val stagedA = stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))
    val stagedB = stageReplace(rootB, sb, Seq(("b", 20L, "txn-b")))
    // a single-table writer replaces b's partition AFTER the stage —
    // table B's prepare must hit the read-set conflict
    AtomicCommit.commitReplacePartitions(spark, rootB, sb,
      Seq(("b", 99L, "winner")).toDF("p", "k", "v"), "p", 1)
    val e = intercept[TxnAbortedException] {
      Transactions.commitAll(Seq(
        Participant(rootA, sa, stagedA), Participant(rootB, sb, stagedB)))
    }
    assert(e.getMessage.contains("aborted during prepare"))
    // NEITHER table shows transaction rows; B shows the winner
    assert(!rows(rootA, sa).exists(_._3.startsWith("txn")))
    assert(!rows(rootB, sb).exists(_._3.startsWith("txn")))
    assert(rows(rootB, sb)("b", 99L, "winner"))
    // A's lineage: seed, pending, revert — resolved head serves seed rows
    assert(rows(rootA, sa) ===
      Set(("a", 1L, "base-a"), ("b", 2L, "base-b")))
    val rawHead = AtomicCommit.manifestAt(sa, rootA,
      AtomicCommit.currentVersion(sa).get)
    assert(rawHead.props.contains(Transactions.RevertedKey))
  }

  test("readers get snapshot isolation under an undecided transaction") {
    val root = Files.createTempDirectory("graft_txn_iso").toString
    val s = new PosixManifestStore(root)
    seed(root, s, "base")
    // a crashed coordinator: pending manifest, no decision object
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(root, s,
      stageReplace(root, s, Seq(("a", 10L, "txn-a"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> root,
        Transactions.TablesKey -> root)))
    assert(AtomicCommit.currentVersion(s).get === 2L) // raw head IS pending
    val served = AtomicCommit.readManifest(s).get
    assert(served.version === 1L) // resolved head steps below it
    assert(rows(root, s) === Set(("a", 1L, "base-a"), ("b", 2L, "base-b")))
  }

  test("a writer force-aborts a stalled transaction and proceeds") {
    val root = Files.createTempDirectory("graft_txn_fa").toString
    val s = new PosixManifestStore(root)
    seed(root, s, "base")
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(root, s,
      stageReplace(root, s, Seq(("a", 10L, "txn-a"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> root,
        Transactions.TablesKey -> root)))
    // an ordinary writer arrives: helping must abort the stalled txn,
    // publish the revert, and land the writer's own commit on top
    val v = AtomicCommit.commitReplacePartitions(spark, root, s,
      Seq(("b", 50L, "writer")).toDF("p", "k", "v"), "p", 1)
    assert(v === 4L) // seed(1), pending(2), revert(3), writer(4)
    assert(rows(root, s) === Set(("a", 1L, "base-a"), ("b", 50L, "writer")))
    val d = s.get(Transactions.decisionName(txnId))
    assert(d.exists(b => new String(b).contains("\"abort\"")))
    // the revert manifest is marked; the writer's head carries no markers
    assert(AtomicCommit.manifestAt(s, root, 3L).props
      .contains(Transactions.RevertedKey))
    assert(!AtomicCommit.readManifest(s).get.props.keys
      .exists(_.startsWith(Transactions.TxnPrefix)))
  }

  test("decided-commit crash window: decision object alone makes it durable") {
    val root = Files.createTempDirectory("graft_txn_dc").toString
    val s = new PosixManifestStore(root)
    seed(root, s, "base")
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(root, s,
      stageReplace(root, s, Seq(("a", 10L, "txn-a"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> root,
        Transactions.TablesKey -> root)))
    // coordinator "crashed" right after writing the commit decision
    s.putIfAbsent(Transactions.decisionName(txnId),
      s"""{"txn":"$txnId","decision":"commit","tables":"$root"}""".getBytes)
    // readers serve the pending-committed head as-is
    assert(rows(root, s)("a", 10L, "txn-a"))
    assert(AtomicCommit.readManifest(s).get.version === 2L)
    // the next ordinary commit strips the markers (lazy seal)
    AtomicCommit.commitReplacePartitions(spark, root, s,
      Seq(("b", 60L, "later")).toDF("p", "k", "v"), "p", 1)
    val head = AtomicCommit.readManifest(s).get
    assert(!head.props.keys.exists(_.startsWith(Transactions.TxnPrefix)))
    assert(rows(root, s) === Set(("a", 10L, "txn-a"), ("b", 60L, "later")))
  }

  test("an aborted version-1 transaction leaves no table behind") {
    // "_0new" sorts before "_a", so the NEW table prepares first and its
    // version-1 pending manifest exists when the abort arrives
    val rootA = Files.createTempDirectory("graft_txn_v1_a").toString
    val rootNew = Files.createTempDirectory("graft_txn_v1_0new").toString
    val (sa, sn) = (new PosixManifestStore(rootA), new PosixManifestStore(rootNew))
    seed(rootA, sa, "base")
    val stagedA = stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))
    val stagedNew = stageReplace(rootNew, sn, Seq(("x", 1L, "txn-new")))
    // conflict on A forces the abort AFTER rootNew may have prepared —
    // sort order: make A the SECOND participant so rootNew prepares first
    AtomicCommit.commitReplacePartitions(spark, rootA, sa,
      Seq(("a", 99L, "winner")).toDF("p", "k", "v"), "p", 1)
    intercept[TxnAbortedException] {
      Transactions.commitAll(Seq(
        Participant(rootNew, sn, stagedNew), Participant(rootA, sa, stagedA)))
    }
    // whichever prepare order applied, the new table must not exist
    assert(AtomicCommit.readManifest(sn).isEmpty)
    assert(rows(rootA, sa)("a", 99L, "winner"))
  }

  test("full protocol on object-store primitives (InMemoryObjectStore)") {
    val rootA = Files.createTempDirectory("graft_txn_oa").toString
    val rootB = Files.createTempDirectory("graft_txn_ob").toString
    val (sa, sb) = (new InMemoryObjectStore, new InMemoryObjectStore)
    Transactions.registerStore(rootA, sa)
    Transactions.registerStore(rootB, sb)
    try {
      seed(rootA, sa, "base"); seed(rootB, sb, "base")
      Transactions.commitAll(Seq(
        Participant(rootA, sa, stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))),
        Participant(rootB, sb, stageReplace(rootB, sb, Seq(("b", 20L, "txn-b"))))))
      assert(rows(rootA, sa)("a", 10L, "txn-a"))
      assert(rows(rootB, sb)("b", 20L, "txn-b"))
      // conflict path on the same primitives
      val stagedB2 = stageReplace(rootB, sb, Seq(("b", 30L, "txn2-b")))
      val stagedA2 = stageReplace(rootA, sa, Seq(("a", 30L, "txn2-a")))
      AtomicCommit.commitReplacePartitions(spark, rootA, sa,
        Seq(("a", 77L, "winner")).toDF("p", "k", "v"), "p", 1)
      intercept[TxnAbortedException] {
        Transactions.commitAll(Seq(
          Participant(rootA, sa, stagedA2), Participant(rootB, sb, stagedB2)))
      }
      assert(!rows(rootA, sa).exists(_._3.startsWith("txn2")))
      assert(!rows(rootB, sb).exists(_._3.startsWith("txn2")))
    } finally {
      Transactions.unregisterStore(rootA)
      Transactions.unregisterStore(rootB)
    }
  }

  test("recover() finalizes an undecided transaction without a writer") {
    val root = Files.createTempDirectory("graft_txn_rec").toString
    val s = new PosixManifestStore(root)
    seed(root, s, "base")
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(root, s,
      stageReplace(root, s, Seq(("a", 10L, "txn-a"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> root,
        Transactions.TablesKey -> root)))
    val settled = Transactions.recover(root, s)
    assert(settled.exists(_.props.contains(Transactions.RevertedKey)))
    assert(rows(root, s) === Set(("a", 1L, "base-a"), ("b", 2L, "base-b")))
  }

  test("change feed skips an abort pair and replicates exactly") {
    val src = Files.createTempDirectory("graft_txn_cf_src").toString
    val dst = Files.createTempDirectory("graft_txn_cf_dst").toString
    val (ss, ds) = (new PosixManifestStore(src), new PosixManifestStore(dst))
    seed(src, ss, "base")
    ChangeFeed.replicateCdc(spark, src, ss, dst, ds, "feed", "k")
    // a committed transaction: its change streams like any commit
    Transactions.commitAll(Seq(Participant(src, ss,
      stageReplace(src, ss, Seq(("a", 10L, "txn-a"))))))
    // an aborted one: manual pending + force-abort by a writer
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(src, ss,
      stageReplace(src, ss, Seq(("b", 66L, "phantom"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> src,
        Transactions.TablesKey -> src)))
    AtomicCommit.commitReplacePartitions(spark, src, ss,
      Seq(("b", 70L, "after")).toDF("p", "k", "v"), "p", 1)
    val covered = ChangeFeed.replicateCdc(spark, src, ss, dst, ds, "feed", "k")
    assert(covered === AtomicCommit.readManifest(ss).get.version)
    assert(rows(dst, ds) === rows(src, ss))
    assert(!rows(dst, ds).exists(_._3 == "phantom"))
  }

  test("vacuum collects decisions of fully-resolved transactions only") {
    val rootA = Files.createTempDirectory("graft_txn_gc_a").toString
    val rootB = Files.createTempDirectory("graft_txn_gc_b").toString
    val (sa, sb) = (new PosixManifestStore(rootA), new PosixManifestStore(rootB))
    seed(rootA, sa, "base"); seed(rootB, sb, "base")
    val versions = Transactions.commitAll(Seq(
      Participant(rootA, sa, stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))),
      Participant(rootB, sb, stageReplace(rootB, sb, Seq(("b", 20L, "txn-b"))))))
    val txnId = AtomicCommit.manifestAt(sa, rootA, versions(rootA))
      .props(Transactions.IdKey)
    val dName = Transactions.decisionName(txnId)
    assert(sa.get(dName).isDefined)
    // pending manifests still on disk reference the txn — decision stays
    AtomicCommit.vacuum(rootA, sa, orphanAgeMillis = 0L, keepVersions = 1)
    assert(sa.get(dName).isDefined)
    // age out the pending manifests on BOTH tables, then GC collects
    AtomicCommit.vacuum(rootB, sb, orphanAgeMillis = 0L, keepVersions = 1)
    AtomicCommit.vacuum(rootA, sa, orphanAgeMillis = 0L, keepVersions = 1)
    assert(sa.get(dName).isEmpty)
    // both tables still read their transaction rows
    assert(rows(rootA, sa)("a", 10L, "txn-a"))
    assert(rows(rootB, sb)("b", 20L, "txn-b"))
  }

  test("readConsistent pairs both tables' post-transaction states") {
    val rootA = Files.createTempDirectory("graft_txn_rc_a").toString
    val rootB = Files.createTempDirectory("graft_txn_rc_b").toString
    val (sa, sb) = (new PosixManifestStore(rootA), new PosixManifestStore(rootB))
    seed(rootA, sa, "base"); seed(rootB, sb, "base")
    Transactions.commitAll(Seq(
      Participant(rootA, sa, stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))),
      Participant(rootB, sb, stageReplace(rootB, sb, Seq(("b", 20L, "txn-b"))))))
    val snap = Transactions.readConsistent(Seq(rootA -> sa, rootB -> sb))
    assert(snap.keySet === Set(rootA, rootB))
    // the snapshot names versions whose contents pair the transaction
    assert(AtomicCommit.readAt(spark, rootA, sa, snap(rootA).version)
      .select("p", "k", "v").as[(String, Long, String)].collect().toSet
      .contains(("a", 10L, "txn-a")))
    assert(AtomicCommit.readAt(spark, rootB, sb, snap(rootB).version)
      .select("p", "k", "v").as[(String, Long, String)].collect().toSet
      .contains(("b", 20L, "txn-b")))
    // an undecided transaction does not destabilize the snapshot: it
    // resolves below the pending head on every pass
    val txnId = java.util.UUID.randomUUID.toString
    AtomicCommit.publish(rootA, sa,
      stageReplace(rootA, sa, Seq(("a", 99L, "phantom"))).copy(props = Map(
        Transactions.IdKey -> txnId,
        Transactions.DecisionRootKey -> rootA,
        Transactions.TablesKey -> rootA)))
    val snap2 = Transactions.readConsistent(Seq(rootA -> sa, rootB -> sb))
    assert(snap2(rootA).version === snap(rootA).version)
  }

  test("append-shaped and props-only participants ride the same protocol") {
    val rootA = Files.createTempDirectory("graft_txn_apa").toString
    val rootB = Files.createTempDirectory("graft_txn_apb").toString
    val (sa, sb) = (new PosixManifestStore(rootA), new PosixManifestStore(rootB))
    seed(rootA, sa, "base"); seed(rootB, sb, "base")
    // A: replace; B: a user prop riding the same transaction
    val mB = AtomicCommit.readManifest(sb).get
    Transactions.commitAll(Seq(
      Participant(rootA, sa, stageReplace(rootA, sa, Seq(("a", 10L, "txn-a")))),
      Participant(rootB, sb, Staged("", mB.partitionCol, Nil, mB.version,
        Map.empty, props = Map("audit.note" -> "paired-with-A")))))
    assert(rows(rootA, sa)("a", 10L, "txn-a"))
    val headB = AtomicCommit.readManifest(sb).get
    assert(headB.props.get("audit.note").contains("paired-with-A"))
    assert(!headB.props.keys.exists(_.startsWith(Transactions.TxnPrefix)))
  }
}
