package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, Compaction, DataSkipping, Deletes, PosixManifestStore}

/** Randomized SOUNDNESS torture for the skipping stack: whatever history a
  * table accrues — replaces, appends, range deletes, MERGE-ON-READ
  * deletes — position AND equality flavored, whose evidence invalidates
  * recorded row counts and must merge into every read path — recluster,
  * z-order, compaction, in any interleaving — every pruned read must equal the
  * full-scan filter, and every point lookup the full-scan equality. The
  * pruning layers under test stack four deep (partition envelope →
  * per-owner envelope → per-file interval → bloom), and each layer's bug
  * class is "pruned a row that exists", which only randomized histories
  * surface reliably. Fixed seed; failures print the probe so they replay.
  */
class DataSkippingFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Partitions = Vector("pa", "pb", "pc", "pd")

  test("40 random probes over a randomly-evolved table: pruned == full, always") {
    val root = Files.createTempDirectory("graft_dsfz").toString
    val store = new PosixManifestStore(root)
    val rnd = new scala.util.Random(20260814L)

    def randomBatch(tag: Int): org.apache.spark.sql.DataFrame = {
      val rows = (0 until (20 + rnd.nextInt(60))).map { i =>
        val p = Partitions(rnd.nextInt(Partitions.size))
        // values cluster per batch so stats sometimes prune, sometimes not
        val base = rnd.nextInt(5) * 1000L
        (tag * 100000L + i, p, base + rnd.nextInt(800),
          s"t$tag-$i")
      }
      rows.toDF("k", "flag", "v", "s")
    }

    // seed commit with stats on both probe columns
    DataSkipping.commitWithStats(spark, root, randomBatch(0), "flag",
      Seq("v", "k"))

    var step = 0
    def evolve(): Unit = {
      step += 1
      rnd.nextInt(9) match {
        case 0 => // replace-with-stats of a fresh batch's partitions
          DataSkipping.commitWithStats(spark, root, randomBatch(step), "flag",
            Seq("v", "k"))
        case 1 => // append with stats AND blooms
          val s = AtomicCommit.stage(spark, root, store, randomBatch(step),
            "flag", 1)
          DataSkipping.annotateStaged(spark, root, s, Seq("v", "k"))
          DataSkipping.annotateStagedBloom(spark, root, s, Seq("k"))
          AtomicCommit.publishAppend(root, store, s)
        case 2 => // range delete (may be a no-op; may drop partitions)
          val lo = rnd.nextInt(5) * 1000L
          Deletes.deleteRange(spark, root, "v", lo, lo + rnd.nextInt(900),
            Seq("v", "k"))
        case 3 => // sort-order rewrite with multi-file stats
          Compaction.recluster(spark, root, Seq("v"),
            filesPerDir = 1 + rnd.nextInt(3), statsCols = Seq("v", "k"))
        case 4 => // z-order rewrite on both probe dims
          Compaction.reclusterZorder(spark, root, Seq("v", "k"),
            filesPerDir = 1 + rnd.nextInt(3))
        case 5 => // merge-on-read range delete: stats/blooms predate the
          // vector, so every later probe exercises the DV-merge soundness
          Deletes.deleteRangeMoR(spark, root, store, "v",
            rnd.nextInt(5) * 1000L, rnd.nextInt(5) * 1000L + rnd.nextInt(250))
        case 6 => // merge-on-read delete by key (point vectors)
          val ks = AtomicCommit.read(spark, root, store)
            .select("k").as[Long].head(3).toSeq
          if (ks.nonEmpty)
            Deletes.deleteWhereMoR(spark, root, store, col("k").isin(ks: _*))
        case 7 => // EQUALITY delete (zero-scan, bloom-narrowed,
          // owner-scoped) — the probes must stay sound under it too
          val ks = AtomicCommit.read(spark, root, store)
            .select("k").as[Long].head(2).toSeq
          if (ks.nonEmpty)
            Deletes.deleteKeysMoR(spark, root, store, "k", ks)
        case 8 => // a vector written by an OLDER writer: strip one
          // bitmap sidecar, so every read until the next rewrite
          // degrades (whole-snapshot, all-or-nothing) to the anti-join
          // merge — probes must stay sound on the fallback path too
          val m = AtomicCommit.readManifest(store).get
          m.entries.values.flatMap(AtomicCommit.dvOf).toSeq.sorted
            .headOption.foreach { g =>
              val d = java.nio.file.Paths.get(root, g, "_dvb")
              if (java.nio.file.Files.isDirectory(d)) {
                import scala.jdk.CollectionConverters._
                java.nio.file.Files.walk(d).iterator().asScala.toSeq
                  .reverse.foreach(java.nio.file.Files.delete)
              }
            }
      }
    }

    def checkProbes(n: Int): Unit = (1 to n).foreach { _ =>
      val full = AtomicCommit.read(spark, root, store)
      // range probe on v
      val lo = rnd.nextInt(6000).toLong - 500
      val hi = lo + rnd.nextInt(2500)
      val pruned = DataSkipping.readWhere(spark, root, store, "v", lo, hi)
        .select("k").as[Long].collect().sorted.toSeq
      val exact = full.filter($"v" >= lo && $"v" <= hi)
        .select("k").as[Long].collect().sorted.toSeq
      assert(pruned === exact, s"range [$lo,$hi] after step $step")
      // the metadata-count path must agree with the scan at every step
      assert(DataSkipping.countWhere(spark, root, store, "v", lo, hi) ===
        exact.size.toLong, s"countWhere [$lo,$hi] after step $step")
      // conjunction probe on (v, k): every grain of every predicate
      val kLo = rnd.nextLong(300000L)
      val kHi = kLo + rnd.nextLong(400000L)
      val both = DataSkipping.readWhereAll(spark, root, store,
        Seq(("v", lo, hi), ("k", kLo, kHi)))
        .select("k").as[Long].collect().sorted.toSeq
      val bothExact = full
        .filter($"v" >= lo && $"v" <= hi && $"k" >= kLo && $"k" <= kHi)
        .select("k").as[Long].collect().sorted.toSeq
      assert(both === bothExact, s"conj v[$lo,$hi] k[$kLo,$kHi] after step $step")
      assert(DataSkipping.countWhereAll(spark, root, store,
        Seq(("v", lo, hi), ("k", kLo, kHi))) === bothExact.size.toLong,
        s"countWhereAll v[$lo,$hi] k[$kLo,$kHi] after step $step")
      // point probe on k: half the time a key that exists
      val existing = full.select("k").as[Long].head(1)
      val key =
        if (rnd.nextBoolean() && existing.nonEmpty) existing.head
        else rnd.nextLong(1000000L)
      val hit = DataSkipping.readWhereEq(spark, root, store, "k", key)
        .select("k").as[Long].collect().sorted.toSeq
      val hitExact = full.filter($"k" === key)
        .select("k").as[Long].collect().sorted.toSeq
      assert(hit === hitExact, s"point k=$key after step $step")
    }

    (1 to 8).foreach { _ =>
      evolve()
      checkProbes(5)
    }
  }
}
