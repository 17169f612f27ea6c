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

  test("local bloom positions match the Spark-job reference under random values/types") {
    import org.apache.spark.sql.functions.{lit, pmod, xxhash64}
    val rnd = new scala.util.Random(20260815L)
    val types = Vector("tinyint", "smallint", "int", "bigint", "float",
      "double", "string", "decimal(12,3)")
    (1 to 60).foreach { i =>
      val dt = types(rnd.nextInt(types.size))
      val v: Any = rnd.nextInt(6) match {
        case 0 => rnd.nextInt(200) - 100
        case 1 => rnd.nextLong() % 100000L
        case 2 => math.round(rnd.nextDouble() * 1e6) / 1e3
        case 3 => rnd.alphanumeric.take(1 + rnd.nextInt(12)).mkString
        case 4 => rnd.nextInt(100).toShort
        case 5 => new java.math.BigDecimal(
          (rnd.nextInt(2000000) - 1000000).toString).movePointLeft(3)
      }
      val numBits = 1 << (8 + rnd.nextInt(8))
      val numHashes = 1 + rnd.nextInt(5)
      val salt = rnd.nextLong()
      val local = DataSkipping.localPositions(Seq(v), dt, numBits,
        numHashes, salt).head
      val job = scala.util.Try {
        val cols = (0 until numHashes).map(h =>
          pmod(xxhash64(lit(v).cast(dt), lit(salt), lit(h)),
            lit(numBits.toLong)).as(s"p$h"))
        val row = spark.range(1).select(cols: _*).head()
        (0 until numHashes).map(row.getLong): Seq[Long]
      }.toOption
      // parity rule: wherever the JOB can compute positions, local must
      // agree bit-for-bit; where it can't, local must admit (None or
      // matching failure) — never invent different positions
      (local, job) match {
        case (Some(l), Some(j)) =>
          assert(l === j, s"probe $i: $v as $dt bits=$numBits h=$numHashes")
        case (Some(_), None) =>
          fail(s"probe $i: local computed where the job could not ($v as $dt)")
        case _ => () // local None always admits — sound
      }
    }
  }

  test("metadata SUM equals the scan across random multi-generation histories") {
    val rnd = new scala.util.Random(20260816L)
    (1 to 6).foreach { round =>
      val root = Files.createTempDirectory(s"graft_sumfz$round").toString
      def batch(tag: Int) = {
        val rows = (0 until (10 + rnd.nextInt(40))).map { i =>
          val p = Partitions(rnd.nextInt(2) match {
            case 0 => rnd.nextInt(2)      // cluster on pa/pb
            case _ => rnd.nextInt(Partitions.size)
          })
          (if (rnd.nextInt(4) == 0) None
           else Some(rnd.nextLong() % 1000000L), p, tag * 1000L + i)
        }
        rows.toDF("v", "flag", "k")
      }
      DataSkipping.commitWithStats(spark, root, batch(0), "flag", Seq("v"))
      (1 to 1 + rnd.nextInt(3)).foreach { t =>
        if (rnd.nextBoolean())
          DataSkipping.commitWithStats(spark, root, batch(t), "flag", Seq("v"))
        else { // append a generation (multi-owner partitions)
          val staged = AtomicCommit.stage(spark, root, batch(t), "flag")
          DataSkipping.annotateStaged(spark, root, staged, Seq("v"))
          AtomicCommit.publishAppend(root,
            new PosixManifestStore(root), staged)
        }
      }
      spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
      spark.conf.set("spark.graft.table.sfz", root)
      try {
        val viaMeta = spark.sql("SELECT sum(v) FROM graft.sfz").collect().head
        val viaScan = AtomicCommit.read(spark, root)
          .agg(org.apache.spark.sql.functions.sum("v")).collect().head
        assert(viaMeta === viaScan, s"round $round: sum mismatch")
        val g = spark.sql(
          "SELECT flag, sum(v), count(*), min(v) FROM graft.sfz GROUP BY flag")
          .collect().map(r => r.getString(0) -> (r.get(1), r.getLong(2),
            r.get(3))).toMap
        val gScan = AtomicCommit.read(spark, root).groupBy("flag")
          .agg(org.apache.spark.sql.functions.sum("v"),
            org.apache.spark.sql.functions.count(lit(1)),
            org.apache.spark.sql.functions.min("v"))
          .collect().map(r => r.getString(0) -> (r.get(1), r.getLong(2),
            r.get(3))).toMap
        assert(g === gScan, s"round $round: grouped mismatch")
      } finally {
        spark.conf.unset("spark.sql.catalog.graft")
        spark.conf.unset("spark.graft.table.sfz")
      }
    }
  }
}
