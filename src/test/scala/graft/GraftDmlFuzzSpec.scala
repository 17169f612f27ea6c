package graft

import java.nio.file.Files
import java.util.concurrent.{Callable, CountDownLatch, Executors, TimeUnit}

import graft.sources.AtomicCommit

/** Multi-writer torture for the SQL DML layer ([[graft.plans
  * .GraftDmlRewrite]]): UPDATE and MERGE INTO are read-modify-write
  * commits, so the classic lost-update test applies — N increments of a
  * counter through racing writers must land as exactly N, or the layer
  * dropped a committed write. Writers race through ONE shared
  * SparkSession (the SQL entry path a real service uses), retrying on
  * [[AtomicCommit.PartitionConflictException]] per the documented loser
  * protocol, while append writers churn the SAME partitions (appends
  * commute and never abort — they exist to land mid-window and force the
  * DML read-set checks to fire) and a DELETE writer takes down seed keys
  * through the zero-scan equality path.
  *
  * Invariants:
  *  - NO LOST INCREMENTS: each counter's final value equals its writer's
  *    successful-iteration count — across both the UPDATE lowering and
  *    the MERGE lowering.
  *  - NO LOST APPENDS: every appended key is present at the end.
  *  - DELETES LAND EXACTLY: deleted keys gone, undeleted neighbors kept.
  *  - VERSIONS DENSE: the retained version sequence has no gaps — every
  *    commit serialized through the CAS.
  */
class GraftDmlFuzzSpec extends SparkSpec {
  import spark.implicits._

  private val Iters = 6

  test("SQL UPDATE/MERGE counters racing appends and equality DELETEs: nothing lost") {
    val root = Files.createTempDirectory("graft_dml_fuzz").toString
    // counters k=1 (UPDATE, partition A), k=2 (UPDATE, B), k=3 (MERGE, A);
    // seed keys 100–103 in C for the deleter
    val seed = Seq(
      (1L, 0L, "A"), (2L, 0L, "B"), (3L, 0L, "A"),
      (100L, 0L, "C"), (101L, 0L, "C"), (102L, 0L, "C"), (103L, 0L, "C"))
    AtomicCommit.commitReplacePartitions(spark, root,
      seed.toDF("k", "v", "p"), "p")
    spark.conf.set("spark.sql.catalog.graft", "graft.sources.GraftCatalog")
    spark.conf.set("spark.graft.table.fz", root)
    val gate = new CountDownLatch(1)
    val pool = Executors.newFixedThreadPool(6)
    try {
      def retrying(body: => Unit): Unit = {
        var done = false
        while (!done) {
          try { body; done = true }
          catch { case _: AtomicCommit.PartitionConflictException => () }
        }
      }
      // two UPDATE counter writers on disjoint keys (shared partitions
      // with the appenders, so the read-set conflict path is exercised)
      def updater(key: Long): Callable[Int] = new Callable[Int] {
        def call(): Int = {
          gate.await()
          (1 to Iters).foreach { _ =>
            retrying(spark.sql(
              s"UPDATE graft.fz SET v = v + 1 WHERE k = $key"))
          }
          Iters
        }
      }
      // a MERGE counter writer: the same increment through the other
      // read-modify-write lowering
      val merger = new Callable[Int] {
        def call(): Int = {
          gate.await()
          (1 to Iters).foreach { _ =>
            retrying(spark.sql(
              """MERGE INTO graft.fz t USING (SELECT 3 AS k) s ON t.k = s.k
                |WHEN MATCHED THEN UPDATE SET v = t.v + 1""".stripMargin))
          }
          Iters
        }
      }
      // two append writers into the counters' partitions: commuting
      // commits that land mid-window and make the DML writers retry
      def appender(w: Long, part: String): Callable[Seq[Long]] = new Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          gate.await()
          (1 to Iters).map { i =>
            val k = 1000L * w + i
            AtomicCommit.commitAppendPartitions(spark, root,
              Seq((k, -1L, part)).toDF("k", "v", "p"), "p", 1)
            k
          }
        }
      }
      // equality deletes (zero-scan commits) interleaving with everything;
      // with no bloom sidecars EVERY partition carries the record, so the
      // delete's publish can conflict with a racing counter rewrite —
      // same loser protocol
      val deleter = new Callable[Seq[Long]] {
        def call(): Seq[Long] = {
          gate.await()
          Seq(100L, 102L).map { k =>
            retrying(spark.sql(s"DELETE FROM graft.fz WHERE k = $k"))
            k
          }
        }
      }
      val fu1 = pool.submit(updater(1L))
      val fu2 = pool.submit(updater(2L))
      val fm = pool.submit(merger)
      val fa1 = pool.submit(appender(1L, "A"))
      val fa2 = pool.submit(appender(2L, "B"))
      val fd = pool.submit(deleter)
      gate.countDown()
      val n1 = fu1.get(300, TimeUnit.SECONDS)
      val n2 = fu2.get(300, TimeUnit.SECONDS)
      val n3 = fm.get(300, TimeUnit.SECONDS)
      val appended = fa1.get(300, TimeUnit.SECONDS) ++ fa2.get(300, TimeUnit.SECONDS)
      val deleted = fd.get(300, TimeUnit.SECONDS)

      val got = spark.sql("SELECT k, v FROM graft.fz")
        .as[(Long, Long)].collect().toMap
      // no lost increments through either lowering
      assert(got(1L) === n1.toLong, s"UPDATE counter k=1: ${got(1L)} of $n1")
      assert(got(2L) === n2.toLong, s"UPDATE counter k=2: ${got(2L)} of $n2")
      assert(got(3L) === n3.toLong, s"MERGE counter k=3: ${got(3L)} of $n3")
      // no lost appends
      appended.foreach(k => assert(got.contains(k), s"append $k lost"))
      // deletes landed exactly
      deleted.foreach(k => assert(!got.contains(k), s"delete $k resurrected"))
      assert(got.contains(101L) && got.contains(103L),
        "undeleted neighbors must survive")
      // the version sequence is dense — every commit serialized
      val vs = AtomicCommit.versions(root)
      assert(vs === (vs.head to vs.last), s"version gaps: $vs")
    } finally {
      pool.shutdown()
      spark.conf.unset("spark.graft.table.fz")
      spark.conf.unset("spark.sql.catalog.graft")
    }
  }
}
