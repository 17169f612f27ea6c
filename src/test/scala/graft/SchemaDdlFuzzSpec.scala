package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}

import org.apache.spark.sql.types.StructType

import graft.sources.{AtomicCommit, PosixManifestStore}

/** Concurrent schema-DDL torture: the rename chain, the dropped set, and
  * the added-column DDL are WHOLE-VALUE manifest props derived from the
  * manifest they commit against — the exact shape [[AtomicCommit]]'s CAS
  * retry-merge would clobber (the loser's staged value is stale the
  * moment it loses). The guarded read-modify-write ([[AtomicCommit
  * .ddlRetry]] + version-pinned propsCommit) must make racing DDL verbs
  * behave like a serial history:
  *
  *  - N concurrent RENAMEs of N distinct columns → ALL N chain entries
  *    present, every new name reads its old column's data.
  *  - N concurrent ADD COLUMNs → ALL N columns in the schema.
  *  - DDL racing APPEND writers → no lost appends, no lost DDL, dense
  *    version sequence.
  */
class SchemaDdlFuzzSpec extends SparkSpec {
  import spark.implicits._

  test("concurrent renames, adds, and appends: every DDL lands, nothing clobbered") {
    val root = Files.createTempDirectory("graft_ddl_fuzz").toString
    val store = new PosixManifestStore(root)
    // five rename-target columns c0..c4 with recognizable values
    val df = spark.range(20).selectExpr(
      "id as k", "id*10 as c0", "id*100 as c1", "id*1000 as c2",
      "id as c3", "id+7 as c4", "cast(id % 2 as string) as p")
    AtomicCommit.commitReplacePartitions(spark, root, df, "p")
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(12)
    try {
      def renamer(i: Int) = new Callable[Unit] {
        def call(): Unit = {
          gate.await()
          AtomicCommit.renameColumn(spark, root, store, s"c$i", s"r$i")
        }
      }
      def adder(i: Int) = new Callable[Unit] {
        def call(): Unit = {
          gate.await()
          AtomicCommit.addColumnsAtomic(spark, root, store,
            StructType.fromDDL(s"a$i BIGINT"))
        }
      }
      def appender(w: Long) = new Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          gate.await()
          (1 to 4).map { i =>
            val k = 1000L * w + i
            AtomicCommit.commitAppendPartitions(spark, root,
              Seq((k, k, k, k, k, k, (k % 2).toString))
                .toDF("k", "c0", "c1", "c2", "c3", "c4", "p"), "p", 1)
            k
          }
        }
      }
      val renames = (0 until 5).map(i => pool.submit(renamer(i)))
      val adds = (0 until 3).map(i => pool.submit(adder(i)))
      val appends = (1L to 2L).map(w => pool.submit(appender(w)))
      gate.countDown()
      renames.foreach(_.get(120, TimeUnit.SECONDS))
      adds.foreach(_.get(120, TimeUnit.SECONDS))
      val appended = appends.flatMap(_.get(120, TimeUnit.SECONDS))

      val m = AtomicCommit.readManifest(store).get
      // ALL five renames survive in the chain — none clobbered
      assert(AtomicCommit.renamesOf(m).toSet ===
        (0 until 5).map(i => s"c$i" -> s"r$i").toSet)
      // ALL three adds survive in the DDL prop
      val added = StructType.fromDDL(
        m.props(AtomicCommit.SchemaAddedProp)).fieldNames.toSet
      assert(added === Set("a0", "a1", "a2"))
      // the logical view serves every era: renamed data intact, appends
      // present, added columns NULL
      val got = AtomicCommit.read(spark, root)
      assert(got.columns.toSet ===
        Set("k", "r0", "r1", "r2", "r3", "r4", "p", "a0", "a1", "a2"))
      assert(got.filter($"k" === 3L).select($"r1").as[Long].head() === 300L)
      appended.foreach { k =>
        assert(got.filter($"k" === k).select($"r0").as[Long].head() === k,
          s"append $k lost or misaligned")
      }
      assert(got.filter($"a0".isNotNull).count() === 0L)
      // every commit serialized: dense version sequence
      val vs = AtomicCommit.versions(root)
      assert(vs === (vs.head to vs.last), s"version gaps: $vs")
      // appends raced 8 data commits + 8 DDL commits: all accounted for
      assert(vs.last >= 1L + 5 + 3 + 8)
    } finally pool.shutdown()
  }

  test("a lost-rename reproduction stays fixed: two DDL verbs from the same snapshot") {
    val root = Files.createTempDirectory("graft_ddl_two").toString
    val store = new PosixManifestStore(root)
    AtomicCommit.commitReplacePartitions(spark, root,
      Seq((1L, 10L, 20L, "A")).toDF("k", "x", "y", "p"), "p")
    // serial calls that each read the manifest themselves — the guarded
    // commit makes the SECOND one recompute over the first's chain even
    // when both verbs target the same whole-value prop
    AtomicCommit.renameColumn(spark, root, store, "x", "x2")
    AtomicCommit.renameColumn(spark, root, store, "y", "y2")
    val m = AtomicCommit.readManifest(store).get
    assert(AtomicCommit.renamesOf(m) === Seq("x" -> "x2", "y" -> "y2"))
    assert(AtomicCommit.read(spark, root).columns.toSet
      === Set("k", "x2", "y2", "p"))
  }
}
