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
}
