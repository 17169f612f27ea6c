package graft

import java.nio.file.{Files, Path, Paths}
import java.time.Instant

import org.apache.spark.sql.functions._

import graft.sources.{AtomicCommit, HiddenPartitioning => HP}

/** [[graft.sources.HiddenPartitioning]] — Iceberg-style partition
  * transforms on manifest tables: writes derive the partition value
  * (`days(ts)`, `bucket(n,k)`, `truncate(w,s)`), reads prune from
  * predicates on the SOURCE column. Pruning is proven physically: the
  * partitions the mapping must skip are DELETED from disk before the
  * read — a scan that touches them cannot return rows.
  */
class HiddenPartitioningSpec extends SparkSpec {
  import spark.implicits._

  /** Physically delete the DATA FILES of `parts` (directories stay, as
    * in GraftDataSourceSpec — a scan that still lists them reads zero
    * rows loudly rather than erroring at path resolution).
    */
  private def dropPartitionDirs(root: String, parts: Set[String]): Unit = {
    val m = AtomicCommit.readManifest(root).get
    for ((p, entry) <- m.entries if parts(p);
         gen <- AtomicCommit.ownersOf(entry)) {
      val dir = Paths.get(root, gen, s"${m.partitionCol}=$p")
      if (Files.isDirectory(dir)) {
        val s = Files.walk(dir)
        try s.filter(f => Files.isRegularFile(f))
          .forEach(f => Files.delete(f))
        finally s.close()
      }
    }
  }

  test("days(ts): derived column, recorded spec, range prune proven physically") {
    val root = Files.createTempDirectory("graft_hp_days").toString
    val rows = Seq(
      (1L, "2024-03-01T05:00:00Z"), (2L, "2024-03-01T23:59:59Z"),
      (3L, "2024-03-02T00:00:00Z"), (4L, "2024-03-03T12:00:00Z"),
      (5L, "2024-03-05T01:00:00Z"), (6L, "2024-03-08T09:30:00Z"))
      .toDF("k", "iso").select(col("k"), to_timestamp(col("iso")).as("ts"))
    HP.commitReplace(spark, root, rows, HP.Days("ts"))
    val m = AtomicCommit.readManifest(root).get
    assert(m.partitionCol === "ts_day")
    assert(m.props(HP.SpecProp) === "days(ts)")
    assert(m.entries.keySet ===
      Set("2024-03-01", "2024-03-02", "2024-03-03", "2024-03-05", "2024-03-08"))
    // the generated column is visible and correct
    assert(AtomicCommit.read(spark, root).where(col("k") === 2L)
      .select("ts_day").as[String].head() === "2024-03-01")
    // prune to [03-02, 03-05]: physically delete every other day first
    dropPartitionDirs(root, Set("2024-03-01", "2024-03-08"))
    val got = HP.readWhereSource(spark, root,
      Instant.parse("2024-03-02T00:00:00Z"), Instant.parse("2024-03-05T23:00:00Z"))
      .select("k").as[Long].collect().toSet
    assert(got === Set(3L, 4L, 5L))
    // exact predicate still applies INSIDE surviving partitions: a bound
    // cutting into day 03-05 drops row 5 even though its partition is read
    val tight = HP.readWhereSource(spark, root,
      Instant.parse("2024-03-02T00:00:00Z"), Instant.parse("2024-03-05T00:30:00Z"))
      .select("k").as[Long].collect().toSet
    assert(tight === Set(3L, 4L))
  }

  test("bucket(n,k): equality maps through Spark's own hash to ONE partition") {
    val root = Files.createTempDirectory("graft_hp_bucket").toString
    val rows = (0L until 64L).map(i => (i, s"name-$i")).toDF("k", "name")
    HP.commitReplace(spark, root, rows, HP.Bucket(8, "k"))
    val m = AtomicCommit.readManifest(root).get
    assert(m.props(HP.SpecProp) === "bucket(8,k)")
    assert(m.entries.keySet.subsetOf((0 until 8).map(_.toString).toSet))
    // driver-side mapEq agrees with the executor-side derivation for
    // every row (the two share Murmur3 seed 42 by construction)
    val derived = AtomicCommit.read(spark, root)
      .select(col("k"), col("k_bucket")).as[(Long, String)].collect()
    derived.foreach { case (k, b) =>
      assert(HP.Bucket(8, "k").mapEq(k) === Some(b), s"k=$k")
    }
    // physical prune proof: keep only k=17's bucket, delete the rest
    val keep = HP.Bucket(8, "k").mapEq(17L).get
    dropPartitionDirs(root, m.entries.keySet - keep)
    assert(HP.readWhereSourceEq(spark, root, 17L)
      .select("name").as[String].head() === "name-17")
  }

  test("truncate(w,s): prefix ranges prune; appends verify the recorded spec") {
    val root = Files.createTempDirectory("graft_hp_trunc").toString
    val rows = Seq("alpha", "amber", "brick", "bring", "crane", "delta")
      .zipWithIndex.map { case (s, i) => (i.toLong, s) }.toDF("k", "code")
    HP.commitReplace(spark, root, rows, HP.Truncate(2, "code"))
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.keySet === Set("al", "am", "br", "cr", "de"))
    // append through the same spec lands in the derived layout
    HP.commitAppend(spark, root, Seq((9L, "brown")).toDF("k", "code"),
      HP.Truncate(2, "code"))
    // a DIFFERENT spec on the same table must fail loudly
    val e = intercept[IllegalArgumentException] {
      HP.commitAppend(spark, root, Seq((10L, "x")).toDF("k", "code"),
        HP.Truncate(3, "code"))
    }
    assert(e.getMessage.contains("truncate(2,code)"))
    // range prune [b, c): physically delete everything not in prefix b*
    dropPartitionDirs(root, Set("al", "am", "cr", "de"))
    val got = HP.readWhereSource(spark, root, "b", "bz")
      .select("code").as[String].collect().toSet
    assert(got === Set("brick", "bring", "brown"))
  }

  test("SQL face: WHERE on the source column prunes through the transform") {
    val root = Files.createTempDirectory("graft_hp_sql").toString
    val rows = Seq(
      (1L, "2024-06-01T10:00:00Z"), (2L, "2024-06-02T10:00:00Z"),
      (3L, "2024-06-03T10:00:00Z"), (4L, "2024-06-09T10:00:00Z"))
      .toDF("k", "iso").select(col("k"), to_timestamp(col("iso")).as("ts"))
    HP.commitReplace(spark, root, rows, HP.Days("ts"))
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.ev", root)
    try {
      // decisive evidence the ts bounds REACH the transform mapping:
      // the same prunedEntriesFor the scan uses (via the table's stats
      // face) prices the bounded read at a strict subset — measured
      // BEFORE the deletion below zeroes the skipped days' bytes
      val table = new graft.sources.GraftTable("ev",
        new graft.sources.GraftRelation(spark, root,
          new graft.sources.PosixManifestStore(root), None))
      def ts(s: String) = java.sql.Timestamp.from(Instant.parse(s))
      val bounded = table.prunedBytes(Array(
        org.apache.spark.sql.sources.GreaterThanOrEqual("ts", ts("2024-06-02T00:00:00Z")),
        org.apache.spark.sql.sources.LessThanOrEqual("ts", ts("2024-06-03T23:00:00Z"))))
      val whole = table.prunedBytes(Array.empty)
      assert(bounded < whole, s"bounded=$bounded whole=$whole")
      // then the physical half: delete the skipped days' data files and
      // the bounded SQL query still answers exactly
      dropPartitionDirs(root, Set("2024-06-01", "2024-06-09"))
      val got = spark.sql(
        "SELECT k FROM graft.ev WHERE ts >= TIMESTAMP'2024-06-02 00:00:00' " +
          "AND ts <= TIMESTAMP'2024-06-03 23:00:00'")
        .as[Long].collect().toSet
      assert(got === Set(2L, 3L))
    } finally {
      spark.conf.unset("spark.sql.catalog.graft")
      spark.conf.unset("spark.graft.table.ev")
    }
  }

  test("non-UTC session is rejected for time transforms") {
    val root = Files.createTempDirectory("graft_hp_tz").toString
    val rows = Seq((1L, "2024-06-01T10:00:00Z")).toDF("k", "iso")
      .select(col("k"), to_timestamp(col("iso")).as("ts"))
    withSQLConf("spark.sql.session.timeZone" -> "America/New_York") {
      val e = intercept[IllegalArgumentException] {
        HP.commitReplace(spark, root, rows, HP.Days("ts"))
      }
      assert(e.getMessage.contains("UTC"))
    }
    // bucket is timezone-free: allowed under any session tz
    withSQLConf("spark.sql.session.timeZone" -> "America/New_York") {
      HP.commitReplace(spark, root, Seq((1L, "a")).toDF("k", "s"),
        HP.Bucket(4, "k"))
    }
  }

  test("bucket: an Int probe of a Long column hashes at the COLUMN's type") {
    val root = Files.createTempDirectory("graft_hp_btype").toString
    val rows = (0L until 64L).map(i => (i, s"name-$i")).toDF("k", "name") // k: Long
    HP.commitReplace(spark, root, rows, HP.Bucket(8, "k"))
    val m = AtomicCommit.readManifest(root).get
    // Murmur3(Int 17) and Murmur3(Long 17) land in different buckets for
    // this n — the premise of the defect; typed mapEq resolves to the
    // column's bucket
    import org.apache.spark.sql.types.LongType
    val longBucket = HP.Bucket(8, "k").mapEq(17L).get
    assert(HP.Bucket(8, "k").mapEq(17).get !== longBucket,
      "test premise: the raw Int hash must differ (pick another n/key otherwise)")
    assert(HP.Bucket(8, "k").mapEq(17, Some(LongType)) === Some(longBucket))
    // physical proof: only 17L's bucket keeps its files; the Int-typed
    // probe must prune TO it, not to Int 17's bucket (empty under the
    // old runtime-type hashing)
    dropPartitionDirs(root, m.entries.keySet - longBucket)
    assert(HP.readWhereSourceEq(spark, root, 17)
      .select("name").as[String].head() === "name-17")
  }

  test("days() over a DATE column: Date/LocalDate bounds prune instead of erroring") {
    val root = Files.createTempDirectory("graft_hp_date").toString
    val rows = Seq((1L, "2024-03-01"), (2L, "2024-03-02"), (3L, "2024-03-05"))
      .toDF("k", "iso").select(col("k"), to_date(col("iso")).as("d"))
    HP.commitReplace(spark, root, rows, HP.Days("d"))
    val m = AtomicCommit.readManifest(root).get
    assert(m.entries.keySet === Set("2024-03-01", "2024-03-02", "2024-03-05"))
    // physical prune proof with java.sql.Date bounds
    dropPartitionDirs(root, Set("2024-03-05"))
    val got = HP.readWhereSource(spark, root,
      java.sql.Date.valueOf("2024-03-01"), java.sql.Date.valueOf("2024-03-02"))
      .select("k").as[Long].collect().toSet
    assert(got === Set(1L, 2L))
    // LocalDate bounds map identically
    val got2 = HP.readWhereSource(spark, root,
      java.time.LocalDate.parse("2024-03-02"),
      java.time.LocalDate.parse("2024-03-02"))
      .select("k").as[Long].collect().toSet
    assert(got2 === Set(2L))
    // an unrecognizable bound maps to NO pruning, not an error
    assert(HP.Days("d").mapRange(new Object, new Object) === None)
    assert(HP.Days("d").mapEq(new Object) === None)
  }
}
