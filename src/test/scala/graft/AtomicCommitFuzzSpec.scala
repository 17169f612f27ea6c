package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}

import graft.sources.{AtomicCommit, InMemoryObjectStore, ManifestStore}

/** Randomized multi-writer torture for the optimistic-concurrency commit:
  * 6 threads × 8 commits each, every commit replacing 1–2 partitions
  * chosen from a pool of 5 with a writer-unique payload, retrying on
  * [[AtomicCommit.PartitionConflictException]] by re-staging against the
  * refreshed snapshot (the documented loser protocol). Fixed seeds, both
  * stores. The invariants are the whole OCC contract at once:
  *
  *  - LINEARIZABILITY OF VERSIONS: final version == number of successful
  *    commits; every version 1..N is present (no gaps, no clobbers).
  *  - LAST-WRITER-WINS PER PARTITION: each partition's final rows are
  *    exactly the payload of the LAST commit that touched it in version
  *    order — nothing torn, nothing resurrected, nothing merged.
  *  - HISTORY REPLAYS: a sample of intermediate versions re-reads to
  *    exactly the state its prefix of commits implies.
  *
  * Thread scheduling varies between runs, so the COMMIT ORDER is not
  * asserted — the invariants hold for EVERY legal serialization, which is
  * precisely what "the CAS serializes racing writers" claims.
  */
class AtomicCommitFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Writers = 6
  private val CommitsPerWriter = 8
  private val Partitions = Vector("A", "B", "C", "D", "E")

  private def runFuzz(root: String, store: ManifestStore): Unit = {
    // seed commit: every partition exists
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(Writers)
    try {
      val futures = (1 to Writers).map { w =>
        pool.submit(new Callable[Seq[(Long, Set[String], Long)]] {
          def call(): Seq[(Long, Set[String], Long)] = {
            val rnd = new scala.util.Random(1000L + w) // per-writer seed
            gate.await()
            (1 to CommitsPerWriter).map { c =>
              val targets = rnd.shuffle(Partitions).take(1 + rnd.nextInt(2)).toSet
              val tag = w * 1000L + c
              val df = targets.toSeq.sorted
                .map(p => (tag, p, s"w$w-c$c")).toDF("writer", "flag", "tag")
              // the loser protocol: re-stage against the refreshed
              // snapshot until the read-set check passes
              var version = -1L
              while (version < 0) {
                val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
                try version = AtomicCommit.publish(root, store, staged)
                catch { case _: AtomicCommit.PartitionConflictException => () }
              }
              (tag, targets, version)
            }
          }
        })
      }
      gate.countDown()
      val commits = futures.flatMap(_.get(300, TimeUnit.SECONDS))

      // every commit got a UNIQUE version, densely 2..(1+total)
      val versions = commits.map(_._3)
      assert(versions.distinct.size === versions.size, "two commits share a version")
      assert(versions.toSet === (2L to (1L + Writers * CommitsPerWriter)).toSet,
        "version sequence has gaps — a commit was clobbered or lost")
      assert(AtomicCommit.currentVersion(store) === Some(1L + Writers * CommitsPerWriter))

      // last-writer-wins per partition, by version order
      val lastTagFor: Map[String, Long] = Partitions.map { p =>
        val touching = commits.filter(_._2.contains(p))
        p -> (if (touching.isEmpty) 0L else touching.maxBy(_._3)._1)
      }.toMap
      val finalState = AtomicCommit.read(spark, root, store)
        .select("flag", "writer").as[(String, Long)].collect()
        .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      Partitions.foreach { p =>
        assert(finalState(p) === Set(lastTagFor(p)),
          s"partition $p holds ${finalState(p)}, expected last writer ${lastTagFor(p)}")
      }

      // a sample of intermediate snapshots replays its exact prefix state
      val byVersion = commits.map(c => c._3 -> c).toMap
      for (v <- Seq(5L, 20L, 1L + Writers * CommitsPerWriter / 2)) {
        val expected = Partitions.map { p =>
          val prefix = commits.filter(c => c._3 <= v && c._2.contains(p))
          p -> (if (prefix.isEmpty) Set(0L) else Set(prefix.maxBy(_._3)._1))
        }.toMap
        val snap = AtomicCommit.readAt(spark, root, store, v)
          .select("flag", "writer").as[(String, Long)].collect()
          .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
        assert(snap === expected, s"version $v does not replay its prefix")
      }
      assert(byVersion.size === commits.size)
    } finally pool.shutdown()
  }

  test("6 racing writers x 8 commits: versions dense, last-writer-wins, history replays (posix)") {
    runFuzz(Files.createTempDirectory("graft_fz_p").toString,
      new graft.sources.PosixManifestStore(
        Files.createTempDirectory("graft_fz_p2").toString))
  }

  test("6 racing writers x 8 commits: same invariants on the object-store contract") {
    runFuzz(Files.createTempDirectory("graft_fz_o").toString,
      new InMemoryObjectStore)
  }

  /** The most conflict-prone operation in the protocol is compaction — a
    * replace of EVERY partition — racing the one operation that cannot
    * conflict: appends. The rule under adversarial proof is
    * appends-commute: an append that lands during a compaction's
    * read→publish window must abort THE COMPACTION (its read-set sees the
    * owner list change), never be silently folded away by a rewrite that
    * never read it. Mixed append/replace writers race a continuous
    * compactor; content is replayed commit-by-commit at the end.
    */
  test("mixed append/replace writers racing a compactor: appends are never folded away") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fz_cmp").toString
    val store = new InMemoryObjectStore
    val writers = 4
    val commitsPer = 6
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers + 1)
    try {
      val compactor = pool.submit(new Callable[Int] {
        def call(): Int = {
          gate.await()
          var attempts = 0
          while (!done.get()) {
            attempts += 1
            try {
              graft.sources.Compaction.compactAtomicTable(spark, root, store,
                filesPerDir = 1, vacuumNow = false, statsCols = Nil)
              compactions.incrementAndGet()
            } catch {
              case _: AtomicCommit.PartitionConflictException => () // raced — retry
            }
            Thread.sleep(50)
          }
          attempts
        }
      })
      val futures = (1 to writers).map { w =>
        pool.submit(new Callable[Seq[(Long, Set[String], Long, Boolean)]] {
          def call(): Seq[(Long, Set[String], Long, Boolean)] = {
            val rnd = new scala.util.Random(7000L + w)
            gate.await()
            (1 to commitsPer).map { c =>
              val targets = rnd.shuffle(Partitions).take(1 + rnd.nextInt(2)).toSet
              val isAppend = rnd.nextInt(10) < 6
              val tag = w * 1000L + c
              val df = targets.toSeq.sorted
                .map(p => (tag, p, s"w$w-c$c")).toDF("writer", "flag", "tag")
              val version =
                if (isAppend)
                  AtomicCommit.commitAppendPartitions(spark, root, store,
                    df, "flag", 1)
                else {
                  var v = -1L
                  while (v < 0) {
                    val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
                    try v = AtomicCommit.publish(root, store, staged)
                    catch { case _: AtomicCommit.PartitionConflictException => () }
                  }
                  v
                }
              (tag, targets, version, isAppend)
            }
          }
        })
      }
      gate.countDown()
      val commits = futures.flatMap(_.get(300, TimeUnit.SECONDS))
      done.set(true)
      val compactorAttempts = compactor.get(120, TimeUnit.SECONDS)
      assert(compactorAttempts > 0)
      // quiesced: one final fold must succeed and single-own every partition
      graft.sources.Compaction.compactAtomicTable(spark, root, store,
        filesPerDir = 1, vacuumNow = false, statsCols = Nil)
      val finalFolds = compactions.get() + 1

      // versions dense across writers AND compactor, no gaps, no clobbers
      val total = 1L + commits.size + finalFolds
      assert(AtomicCommit.currentVersion(store) === Some(total))
      assert(AtomicCommit.versions(store).toSet === (1L to total).toSet)
      assert(commits.map(_._3).distinct.size === commits.size)

      // content replay: compactions are content-neutral, so the expected
      // state folds ONLY writer commits in version order — seed 0, a
      // replace resets the partition to its tag, an append adds its tag.
      // Any append silently folded away by a racing compaction breaks this.
      def expectedAt(v: Long): Map[String, Set[Long]] =
        Partitions.map { p =>
          var s = Set(0L)
          commits.filter(c => c._3 <= v && c._2.contains(p))
            .sortBy(_._3).foreach { case (tag, _, _, isAppend) =>
              s = if (isAppend) s + tag else Set(tag)
            }
          p -> s
        }.toMap
      val finalState = AtomicCommit.read(spark, root, store)
        .select("flag", "writer").as[(String, Long)].collect()
        .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      assert(finalState === expectedAt(Long.MaxValue))
      // every partition folded to a single owner by the final compaction
      val m = AtomicCommit.readManifest(store).get
      assert(m.entries.values.forall(e => AtomicCommit.ownersOf(e).size == 1))
      // intermediate snapshots replay their writer-commit prefix exactly,
      // INCLUDING versions that are compaction commits
      for (v <- Seq(3L, total / 2, total - 1)) {
        val snap = AtomicCommit.readAt(spark, root, store, v)
          .select("flag", "writer").as[(String, Long)].collect()
          .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
        assert(snap === expectedAt(v), s"version $v does not replay its prefix")
      }
    } finally pool.shutdown()
  }

  /** Vacuum in the race: writers churn while a maintenance thread
    * continuously vacuums with a retention window. The claims under
    * adversarial proof are the retention rules themselves — a LARGE
    * `orphanAgeMillis` means a racing writer's staged-but-unpublished
    * generation is NEVER reaped (so no commit can fail its publish
    * existence check), a tagged version survives every sweep with its
    * data intact, and whatever versions remain on disk afterward replay
    * their exact writer-commit prefix. Readers-vs-vacuum timing is the
    * CALLER's contract (keepVersions bounds reader lag) and is not
    * exercised here — no reader holds a snapshot across sweeps.
    */
  test("writers racing a continuous vacuum: staged work survives, tags pin, history replays") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fz_vac").toString
    val store = new graft.sources.PosixManifestStore(
      root) // posix: vacuum's directory reaping is the POSIX deployment
    val writers = 3
    val commitsPer = 5
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    AtomicCommit.tag(root, store, "pinned", 1L)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val sweeps = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers + 1)
    try {
      val vacuumer = pool.submit(new Callable[Unit] {
        def call(): Unit = {
          gate.await()
          while (!done.get()) {
            // orphanAge = 1h: a racing writer's in-flight stage is never
            // mistaken for a crash orphan (the documented contract)
            AtomicCommit.vacuum(root, store,
              AtomicCommit.OrphanRetentionMillis, 2)
            sweeps.incrementAndGet()
            Thread.sleep(40)
          }
        }
      })
      val futures = (1 to writers).map { w =>
        pool.submit(new Callable[Seq[(Long, Set[String], Long, Boolean)]] {
          def call(): Seq[(Long, Set[String], Long, Boolean)] = {
            val rnd = new scala.util.Random(9000L + w)
            gate.await()
            (1 to commitsPer).map { c =>
              val targets = rnd.shuffle(Partitions).take(1 + rnd.nextInt(2)).toSet
              val isAppend = rnd.nextBoolean()
              val tag = w * 1000L + c
              val df = targets.toSeq.sorted
                .map(p => (tag, p, s"w$w-c$c")).toDF("writer", "flag", "tag")
              val version =
                if (isAppend)
                  AtomicCommit.commitAppendPartitions(spark, root, store,
                    df, "flag", 1)
                else {
                  var v = -1L
                  while (v < 0) {
                    val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
                    try v = AtomicCommit.publish(root, store, staged)
                    catch { case _: AtomicCommit.PartitionConflictException => () }
                  }
                  v
                }
              (tag, targets, version, isAppend)
            }
          }
        })
      }
      gate.countDown()
      val commits = futures.flatMap(_.get(300, TimeUnit.SECONDS))
      done.set(true)
      vacuumer.get(60, TimeUnit.SECONDS)
      AtomicCommit.vacuum(root, store, AtomicCommit.OrphanRetentionMillis, 2)
      assert(sweeps.get() > 0, "the vacuum thread never swept")

      // every commit succeeded with a distinct version — no publish was
      // broken by a sweep (the orphan-age rule protected every stage)
      val total = 2L + commits.size // seed + tag commit + writers
      assert(AtomicCommit.currentVersion(store) === Some(total))
      assert(commits.map(_._3).distinct.size === commits.size)

      def expectedAt(v: Long): Map[String, Set[Long]] =
        Partitions.map { p =>
          var s = Set(0L)
          commits.filter(c => c._3 <= v && c._2.contains(p))
            .sortBy(_._3).foreach { case (tag, _, _, isAppend) =>
              s = if (isAppend) s + tag else Set(tag)
            }
          p -> s
        }.toMap
      // final state exact
      val finalState = AtomicCommit.read(spark, root, store)
        .select("flag", "writer").as[(String, Long)].collect()
        .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      assert(finalState === expectedAt(Long.MaxValue))
      // retention: the window survived, everything else is gone except
      // the tagged snapshot, which replays its exact seed state
      val remaining = AtomicCommit.versions(store).toSet
      assert(remaining.contains(total) && remaining.contains(total - 1),
        s"keepVersions=2 window missing from $remaining")
      assert(remaining.contains(1L), s"tagged v1 vacuumed: $remaining")
      assert(remaining.size <= 3, s"stale versions not reaped: $remaining")
      val pinned = AtomicCommit.readTag(spark, root, store, "pinned")
        .select("flag", "writer").as[(String, Long)].collect()
        .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      assert(pinned === Partitions.map(_ -> Set(0L)).toMap,
        "the pinned snapshot's data must survive every sweep byte-intact")
      // every version still on disk replays its writer-commit prefix
      remaining.filter(_ > 1L).foreach { v =>
        val snap = AtomicCommit.readAt(spark, root, store, v)
          .select("flag", "writer").as[(String, Long)].collect()
          .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
        assert(snap === expectedAt(v), s"version $v does not replay its prefix")
      }
    } finally pool.shutdown()
  }

  /** r14: the merge-on-read delete joins the race. A deleter thread marks
    * the seed rows of partitions A–D deleted (one DV commit each, E kept
    * so the table can never empty) while mixed append/replace writers and
    * a continuous compactor churn. The adversarial claims: a DV commit's
    * read-set anchors like any rewrite (it aborts rather than clobbering
    * a concurrent replace — and vice versa: a replace that lands after a
    * DV commit OWNS the partition, seed resurrection would break replay);
    * compaction folds the MERGED view, so vectors purge without
    * un-deleting; and every surviving snapshot replays the exact
    * interleaving of appends, replaces, and row deletes its version
    * prefix implies.
    */
  test("append/replace writers racing a MoR deleter and a compactor: deletes serialize, replay holds") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val root = Files.createTempDirectory("graft_fz_mor").toString
    val store = new InMemoryObjectStore
    val writers = 3
    val commitsPer = 5
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val compactions = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(writers + 2)
    try {
      val compactor = pool.submit(new Callable[Int] {
        def call(): Int = {
          gate.await()
          var attempts = 0
          while (!done.get()) {
            attempts += 1
            try {
              graft.sources.Compaction.compactAtomicTable(spark, root, store,
                filesPerDir = 1, vacuumNow = false, statsCols = Nil)
              compactions.incrementAndGet()
            } catch {
              case _: AtomicCommit.PartitionConflictException => ()
            }
            Thread.sleep(60)
          }
          attempts
        }
      })
      // the deleter: one MoR commit per target partition, loser-protocol
      // retries; None = the seed was already replaced before any attempt
      // landed (then there is nothing to delete — writer rows keep tags)
      val deleter = pool.submit(new Callable[Seq[(String, Option[Long])]] {
        def call(): Seq[(String, Option[Long])] = {
          gate.await()
          Seq("A", "B", "C", "D").map { target =>
            var out: Option[Option[Long]] = None
            while (out.isEmpty) {
              try out = Some(graft.sources.Deletes.deleteWhereMoR(spark,
                root, store, col("writer") === 0L && col("flag") === target))
              catch { case _: AtomicCommit.PartitionConflictException => () }
            }
            Thread.sleep(30)
            target -> out.get
          }
        }
      })
      val futures = (1 to writers).map { w =>
        pool.submit(new Callable[Seq[(Long, Set[String], Long, Boolean)]] {
          def call(): Seq[(Long, Set[String], Long, Boolean)] = {
            val rnd = new scala.util.Random(11000L + w)
            gate.await()
            (1 to commitsPer).map { c =>
              val targets = rnd.shuffle(Partitions).take(1 + rnd.nextInt(2)).toSet
              val isAppend = rnd.nextInt(10) < 6
              val tag = w * 1000L + c
              val df = targets.toSeq.sorted
                .map(p => (tag, p, s"w$w-c$c")).toDF("writer", "flag", "tag")
              val version =
                if (isAppend)
                  AtomicCommit.commitAppendPartitions(spark, root, store,
                    df, "flag", 1)
                else {
                  var v = -1L
                  while (v < 0) {
                    val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
                    try v = AtomicCommit.publish(root, store, staged)
                    catch { case _: AtomicCommit.PartitionConflictException => () }
                  }
                  v
                }
              (tag, targets, version, isAppend)
            }
          }
        })
      }
      gate.countDown()
      val commits = futures.flatMap(_.get(300, TimeUnit.SECONDS))
      val deletes = deleter.get(300, TimeUnit.SECONDS)
      done.set(true)
      compactor.get(120, TimeUnit.SECONDS)

      // versions dense across all three writer kinds
      val landedDeletes = deletes.collect { case (p, Some(v)) => (p, v) }
      val total = 1L + commits.size + landedDeletes.size + compactions.get()
      assert(AtomicCommit.currentVersion(store) === Some(total))
      assert(AtomicCommit.versions(store).toSet === (1L to total).toSet)

      // replay model: seed 0, replace resets to its tag, append adds its
      // tag, a landed MoR delete removes the seed row if still present;
      // compactions are content-neutral. An empty fold = partition absent.
      sealed trait Ev { def v: Long }
      case class W(tag: Long, append: Boolean, v: Long) extends Ev
      case class D(v: Long) extends Ev
      def expectedAt(ver: Long): Map[String, Set[Long]] =
        Partitions.flatMap { p =>
          val evs: Seq[Ev] =
            (commits.filter(c => c._3 <= ver && c._2.contains(p))
              .map(c => W(c._1, c._4, c._3)) ++
              landedDeletes.filter(d => d._1 == p && d._2 <= ver)
                .map(d => D(d._2))).sortBy(_.v)
          var s = Set(0L)
          evs.foreach {
            case W(tag, true, _) => s = s + tag
            case W(tag, false, _) => s = Set(tag)
            case D(_) => s = s - 0L
          }
          if (s.isEmpty) None else Some(p -> s)
        }.toMap
      def stateAt(read: => org.apache.spark.sql.DataFrame): Map[String, Set[Long]] =
        read.select("flag", "writer").as[(String, Long)].collect()
          .groupBy(_._1).map { case (p, rows) => p -> rows.map(_._2).toSet }
      assert(stateAt(AtomicCommit.read(spark, root, store)) ===
        expectedAt(Long.MaxValue))
      for (v <- Seq(3L, total / 2, total - 1)) {
        assert(stateAt(AtomicCommit.readAt(spark, root, store, v)) ===
          expectedAt(v), s"version $v does not replay its prefix")
      }
      // quiesced compaction leaves no vectors behind
      graft.sources.Compaction.compactAtomicTable(spark, root, store,
        filesPerDir = 1, vacuumNow = false, statsCols = Nil)
      val m = AtomicCommit.readManifest(store).get
      assert(m.entries.values.forall(e => AtomicCommit.dvOf(e).isEmpty))
      assert(stateAt(AtomicCommit.read(spark, root, store)) ===
        expectedAt(Long.MaxValue))
    } finally pool.shutdown()
  }

  /** r14: branches under contention. Two branch writers and a main writer
    * churn concurrently (each lineage its own partitions), then a merger
    * three-way-merges branch 1 WHILE main keeps committing — the merge's
    * CAS loses to concurrent main commits and must retry, never
    * interleave (a half-merged manifest cannot exist: the merge is one
    * putIfAbsent). Claims: fork isolation held during the race (main's
    * manifest never referenced a branch generation), each merge lands
    * exactly the branch's partitions, and the final state is every
    * lineage's last word on its own partitions.
    */
  test("writers on two branches racing main and a live merger: isolation and merge atomicity") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fz_br").toString
    val store = new InMemoryObjectStore
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    AtomicCommit.createBranch(root, store, "b1")
    AtomicCommit.createBranch(root, store, "b2")
    val bs1 = AtomicCommit.branchStore(store, "b1")
    val bs2 = AtomicCommit.branchStore(store, "b2")
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    def churn(view: ManifestStore, parts: Seq[String], seedBase: Long,
              n: Int): Callable[Long] = new Callable[Long] {
      def call(): Long = {
        val rnd = new scala.util.Random(seedBase)
        gate.await()
        var last = 0L
        (1 to n).foreach { c =>
          val p = parts(c % parts.size) // deterministic coverage of both
          val tag = seedBase + c
          val df = Seq((tag, p, s"t$tag")).toDF("writer", "flag", "tag")
          val isAppend = rnd.nextBoolean()
          if (isAppend)
            AtomicCommit.commitAppendPartitions(spark, root, view, df, "flag", 1)
          else {
            var v = -1L
            while (v < 0) {
              val staged = AtomicCommit.stage(spark, root, view, df, "flag", 1)
              try v = AtomicCommit.publish(root, view, staged)
              catch { case _: AtomicCommit.PartitionConflictException => () }
            }
          }
          last = tag
        }
        last
      }
    }
    try {
      val fb1 = pool.submit(churn(bs1, Seq("A", "B"), 100L, 5))
      val fb2 = pool.submit(churn(bs2, Seq("C", "D"), 200L, 5))
      val fmainRace = pool.submit(churn(store, Seq("E"), 300L, 4))
      gate.countDown()
      fb1.get(300, TimeUnit.SECONDS); fb2.get(300, TimeUnit.SECONDS)
      fmainRace.get(300, TimeUnit.SECONDS)
      // fork isolation after the churn: main's A–D entries are exactly
      // the seed commit's (no branch generation ever leaked into main)
      val seedEntries = AtomicCommit.manifestAt(store, root, 1L).entries
      val mainNow = AtomicCommit.readManifest(store).get.entries
      Seq("A", "B", "C", "D").foreach { p =>
        assert(mainNow(p) === seedEntries(p), s"branch write leaked into main at $p")
      }
      // merge b1 while main is STILL committing: the merger retries CAS
      // losses; every abort must leave main fully unmerged or the final
      // state check below breaks
      val fmain2 = pool.submit(churn(store, Seq("E"), 400L, 4))
      val merger = pool.submit(new Callable[Long] {
        def call(): Long = {
          var v = -1L
          var tries = 0
          while (v < 0) {
            tries += 1
            try v = AtomicCommit.mergeBranch(root, store, "b1")
            catch { case _: AtomicCommit.PartitionConflictException =>
              Thread.sleep(10) }
          }
          v
        }
      })
      val lastMain = fmain2.get(300, TimeUnit.SECONDS)
      merger.get(300, TimeUnit.SECONDS)
      val m2 = AtomicCommit.mergeBranch(root, store, "b2")
      // versions dense through every churn and both merges
      assert(AtomicCommit.versions(store).toSet === (1L to m2).toSet)
      // each partition holds its own lineage's final content
      val finalState = AtomicCommit.read(spark, root, store)
        .select("flag", "writer").as[(String, Long)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).max).toMap
      assert(finalState("E") === lastMain,
        s"E must hold main's last word, got ${finalState("E")}")
      Seq("A" -> 105L, "B" -> 105L, "C" -> 205L, "D" -> 205L).foreach {
        case (p, maxTag) => assert(finalState(p) <= maxTag &&
          finalState(p) > maxTag - 6L, s"$p holds foreign content: ${finalState(p)}")
      }
      // branch views survived untouched by the merges
      assert(AtomicCommit.read(spark, root, bs2)
        .filter($"flag" === "E").select("writer").as[Long].collect().toSet === Set(0L))
    } finally pool.shutdown()
  }

  /** r14: READERS IN THE RACE. The vacuum fuzz above verifies tagged
    * snapshots after the churn settles; this one reads DURING it — a
    * reader re-resolving a tagged snapshot and the trailing window while
    * writers commit, a compactor folds, and a vacuum sweeps with a
    * retention window covering the reader's lag. Claims: a tagged
    * snapshot reads byte-identically every time, mid-churn; reads of
    * retained versions never throw and are self-consistent (two reads of
    * one version agree); and no read ever observes a half-state.
    */
  test("readers racing writers, a compactor, and vacuum: pinned snapshots stable mid-churn") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft_fz_read").toString
    val store = new graft.sources.PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root, store,
      Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
      "flag", 1)
    AtomicCommit.tag(root, store, "pin", 1L)
    val seedState = AtomicCommit.readTag(spark, root, store, "pin")
      .select("flag", "writer").as[(String, Long)].collect().toSet
    val done = new java.util.concurrent.atomic.AtomicBoolean(false)
    val readsOk = new java.util.concurrent.atomic.AtomicInteger(0)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(4)
    try {
      val reader = pool.submit(new Callable[Option[String]] {
        def call(): Option[String] = {
          gate.await()
          try {
            while (!done.get()) {
              // the pinned snapshot must read identically, mid-churn
              val pinned = AtomicCommit.readTag(spark, root, store, "pin")
                .select("flag", "writer").as[(String, Long)].collect().toSet
              if (pinned != seedState)
                return Some(s"pinned snapshot drifted: $pinned")
              // a retained trailing version must be self-consistent
              val vs = AtomicCommit.versions(store)
              if (vs.size >= 2) {
                val v = vs(vs.size - 2)
                try {
                  val a = AtomicCommit.readAt(spark, root, store, v)
                    .select("flag", "writer").as[(String, Long)].collect().toSet
                  val b = AtomicCommit.readAt(spark, root, store, v)
                    .select("flag", "writer").as[(String, Long)].collect().toSet
                  if (a != b) return Some(s"version $v self-inconsistent")
                } catch {
                  // the version aged out between list and read — vacuum
                  // timing, a loud miss, never a wrong answer
                  case e: RuntimeException
                    if Option(e.getMessage).exists(m =>
                      m.contains("vacuumed") || m.contains("no manifest")) => ()
                }
              }
              readsOk.incrementAndGet()
            }
            None
          } catch { case e: Throwable => Some(s"reader died: $e") }
        }
      })
      val writer = pool.submit(new Callable[Unit] {
        def call(): Unit = {
          val rnd = new scala.util.Random(33L)
          gate.await()
          (1 to 10).foreach { c =>
            val p = Partitions(rnd.nextInt(Partitions.size))
            val df = Seq((c.toLong, p, s"c$c")).toDF("writer", "flag", "tag")
            if (rnd.nextBoolean())
              AtomicCommit.commitAppendPartitions(spark, root, store, df, "flag", 1)
            else {
              var v = -1L
              while (v < 0) {
                val staged = AtomicCommit.stage(spark, root, store, df, "flag", 1)
                try v = AtomicCommit.publish(root, store, staged)
                catch { case _: AtomicCommit.PartitionConflictException => () }
              }
            }
            Thread.sleep(30)
          }
        }
      })
      val maintainer = pool.submit(new Callable[Unit] {
        def call(): Unit = {
          gate.await()
          while (!done.get()) {
            try graft.sources.Compaction.compactAtomicTable(spark, root, store,
              1, vacuumNow = false, Nil)
            catch { case _: AtomicCommit.PartitionConflictException => () }
            AtomicCommit.vacuum(root, store,
              AtomicCommit.OrphanRetentionMillis, 4)
            Thread.sleep(60)
          }
        }
      })
      gate.countDown()
      writer.get(300, TimeUnit.SECONDS)
      Thread.sleep(200)
      done.set(true)
      maintainer.get(120, TimeUnit.SECONDS)
      val failure = reader.get(120, TimeUnit.SECONDS)
      assert(failure.isEmpty, failure.getOrElse(""))
      assert(readsOk.get() > 0, "the reader never completed a read")
    } finally pool.shutdown()
  }

  /** r14: MULTI-TABLE TRANSACTIONS in the race ([[graft.sources
    * .Transactions]]). Two transaction writers repeatedly commit paired
    * replaces across TWO tables while single-table appenders churn other
    * partitions of each (force-aborting any transaction they catch
    * undecided past its grace) and a reader snapshots both tables
    * mid-flight. Claims:
    *
    *  - ATOMICITY: each transaction partition's final content is the
    *    same successful transaction's payload on BOTH tables.
    *  - ISOLATION: the reader NEVER observes a payload of an aborted
    *    transaction — pending heads resolve below the transaction until
    *    its decision exists.
    *  - LIVENESS: appenders always get through (their commits finalize
    *    stalled transactions rather than blocking), and under a grace
    *    window transactions make progress too.
    */
  test("transactions racing single-table writers on two tables: atomic, isolated, live") {
    import spark.implicits._
    import graft.sources.Transactions
    import graft.sources.Transactions.{Participant, TxnAbortedException}
    val root1 = Files.createTempDirectory("graft_fz_tx1").toString
    val root2 = Files.createTempDirectory("graft_fz_tx2").toString
    val (s1, s2) = (new InMemoryObjectStore, new InMemoryObjectStore)
    Transactions.registerStore(root1, s1)
    Transactions.registerStore(root2, s2)
    val saveGrace = Transactions.undecidedGraceMillis
    Transactions.undecidedGraceMillis = 100L
    Seq((root1, s1), (root2, s2)).foreach { case (r, s) =>
      AtomicCommit.commitReplacePartitions(spark, r, s,
        Partitions.map(p => (0L, p, "seed")).toDF("writer", "flag", "tag"),
        "flag", 1)
    }
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(5)
    val successes =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val observed =
      java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    def txnWriter(w: Long, part: String, n: Int): Callable[Int] =
      new Callable[Int] {
        def call(): Int = {
          gate.await()
          var ok = 0
          (1 to n).foreach { i =>
            val marker = s"txn$w-$i"
            val df = Seq((w, part, marker)).toDF("writer", "flag", "tag")
            try {
              Transactions.commitAll(Seq(
                Participant(root1, s1,
                  AtomicCommit.stage(spark, root1, s1, df, "flag", 1)),
                Participant(root2, s2,
                  AtomicCommit.stage(spark, root2, s2, df, "flag", 1))))
              successes.add(marker); ok += 1
            } catch {
              case _: TxnAbortedException => () // losing is legal; lying isn't
            }
          }
          ok
        }
      }
    def appender(r: String, s: ManifestStore, part: String, base: Long,
                 n: Int): Callable[Long] = new Callable[Long] {
      def call(): Long = {
        gate.await()
        (1 to n).foreach { i =>
          AtomicCommit.commitAppendPartitions(spark, r, s,
            Seq((base + i, part, s"app$base-$i")).toDF("writer", "flag", "tag"),
            "flag", 1)
        }
        n.toLong
      }
    }
    val reader = new Callable[Long] {
      def call(): Long = {
        gate.await()
        var reads = 0L
        while (!stop.get()) {
          Seq((root1, s1), (root2, s2)).foreach { case (r, s) =>
            AtomicCommit.read(spark, r, s)
              .filter($"flag".isin("A", "B")).select("tag").as[String]
              .collect().foreach(observed.add)
          }
          reads += 1
        }
        reads
      }
    }
    try {
      val ft1 = pool.submit(txnWriter(1L, "A", 6))
      val ft2 = pool.submit(txnWriter(2L, "B", 6))
      val fa1 = pool.submit(appender(root1, s1, "C", 100L, 8))
      val fa2 = pool.submit(appender(root2, s2, "D", 200L, 8))
      val frd = pool.submit(reader)
      gate.countDown()
      val ok1 = ft1.get(300, TimeUnit.SECONDS)
      val ok2 = ft2.get(300, TimeUnit.SECONDS)
      fa1.get(300, TimeUnit.SECONDS); fa2.get(300, TimeUnit.SECONDS)
      stop.set(true)
      val reads = frd.get(300, TimeUnit.SECONDS)
      assert(reads > 0, "the reader never completed a pass")
      // ISOLATION: nothing the reader ever saw came from an aborted
      // transaction
      val legal = Set("seed") ++ successes.toArray.map(_.toString)
      val illegal = observed.toArray.map(_.toString).toSet -- legal
      assert(illegal.isEmpty, s"aborted payloads were visible: $illegal")
      // ATOMICITY: per transaction partition, both tables' final content
      // is the same successful marker (or neither was ever won)
      Seq("A", "B").foreach { p =>
        val t1 = AtomicCommit.read(spark, root1, s1)
          .filter($"flag" === p).select("tag").as[String].collect().toSet
        val t2 = AtomicCommit.read(spark, root2, s2)
          .filter($"flag" === p).select("tag").as[String].collect().toSet
        assert(t1 === t2, s"transaction partition $p diverged: $t1 vs $t2")
        assert(t1.size === 1)
        assert(legal(t1.head), s"$p holds unknown payload ${t1.head}")
      }
      // LIVENESS: every append landed; transactions made progress
      val c1 = AtomicCommit.read(spark, root1, s1)
        .filter($"flag" === "C").count()
      val d2 = AtomicCommit.read(spark, root2, s2)
        .filter($"flag" === "D").count()
      assert(c1 === 9L, s"table1 C: $c1") // seed + 8 appends
      assert(d2 === 9L, s"table2 D: $d2")
      assert(ok1 + ok2 > 0, "no transaction ever committed under the race")
    } finally {
      stop.set(true)
      pool.shutdown()
      Transactions.undecidedGraceMillis = saveGrace
      Transactions.unregisterStore(root1)
      Transactions.unregisterStore(root2)
    }
  }
}
