package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.MinHash
import graft.sources.{AtomicCommit, Deletes, InMemoryObjectStore}
import graft.streaming.{AtomicStreamSink, ChangeFeed}

/** End-to-end integration of the table stack with the similarity stack:
  * a MinHash-LSH DEDUP INDEX maintained INCREMENTALLY over a document
  * table's change feed. The index is a materialized view — rows
  * (lang, doc_id, band, bucket) — kept in sync by
  * [[ChangeFeed.syncAggregate]]: each tick recomputes signatures ONLY for
  * partitions whose owner changed, so continuously ingesting a 100 TB
  * corpus keeps its dedup index fresh at O(changed partitions) per tick
  * instead of re-sketching the world. The spec pins: the incremental
  * index equals the batch-built index after every mutation (appends,
  * row deletes, partition drops), untouched partitions' view generations
  * are untouched (the O(changed) proof at manifest level), and the index
  * actually finds the planted near-duplicate pair via its bucket join.
  */
class IncrementalIndexSpec extends SparkSpec {
  import spark.implicits._

  private val Bands = 4
  private val Rows = 4 // 16 hashes = Bands × Rows

  /** doc table slice → LSH index rows, partition column preserved. */
  private def index(df: DataFrame): DataFrame = {
    val sigs = MinHash.signatures(df, "doc_id", "text",
      nHashes = Bands * Rows, keep = Seq("lang"))
    sigs.select(col("lang"), col("id").as("doc_id"),
      explode(array((0 until Bands).map(b =>
        struct(lit(b).as("band"),
          xxhash64(slice(col("sig"), b * Rows + 1, Rows)).as("bucket"))): _*))
        .as("bb"))
      .select(col("lang"), col("doc_id"), col("bb.band").as("band"),
        col("bb.bucket").as("bucket"))
  }

  private def rowsOf(df: DataFrame): Set[(String, Long, Int, Long)] =
    df.select("lang", "doc_id", "band", "bucket")
      .as[(String, Long, Int, Long)].collect().toSet

  test("LSH index stays equal to its batch rebuild across appends, deletes, and drops") {
    val srcRoot = Files.createTempDirectory("graft_ix_src").toString
    val ixRoot = Files.createTempDirectory("graft_ix_view").toString
    val src = new InMemoryObjectStore
    val ix = new InMemoryObjectStore
    def tick(): Unit =
      ChangeFeed.syncAggregate(spark, srcRoot, src, ixRoot, ix, "lshix")(index)
    def assertSynced(): Unit =
      assert(rowsOf(AtomicCommit.read(spark, ixRoot, ix)) ===
        rowsOf(index(AtomicCommit.read(spark, srcRoot, src))))

    // seed corpus: two langs; de holds a planted near-duplicate pair
    val base = Seq(
      (1L, "de", "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "de", "the quick brown fox jumps over the lazy dog again and again!"),
      (3L, "de", "completely unrelated text about parquet manifests and commits"),
      (4L, "fr", "un texte totalement différent qui parle de flux et de tables"),
      (5L, "fr", "encore un autre document sans rapport avec les précédents"))
    AtomicCommit.commitReplacePartitions(spark, srcRoot, src,
      base.toDF("doc_id", "lang", "text"), "lang", 1)
    tick()
    assertSynced()

    // the index finds the planted pair through its bucket join
    val view = AtomicCommit.read(spark, ixRoot, ix)
    val pairs = view.alias("a").join(view.alias("b"),
        col("a.band") === col("b.band") &&
        col("a.bucket") === col("b.bucket") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id"), col("b.doc_id")).distinct()
      .as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)), s"near-dup pair not bucketed: $pairs")
    assert(!pairs.contains((4L, 5L)), "unrelated docs should not collide")

    // streaming append into fr only → tick must not touch de's view gen
    val deGen = AtomicCommit.readManifest(ix).get.entries("de")
    AtomicStreamSink.commitBatch(srcRoot, src, "lang", "in",
      Seq((6L, "fr", "un sixième document arrive par le flux de données"))
        .toDF("doc_id", "lang", "text"), 0L)
    tick()
    assertSynced()
    assert(AtomicCommit.readManifest(ix).get.entries("de") === deGen,
      "de changed in the view although only fr changed in the source")

    // row delete in de → its index rows vanish on the next tick
    Deletes.deleteWhere(spark, srcRoot, src, col("doc_id") === 3L, Nil)
    tick()
    assertSynced()
    assert(!rowsOf(AtomicCommit.read(spark, ixRoot, ix)).exists(_._2 == 3L))

    // dropping all of de from the source drops de from the index
    Deletes.deleteWhere(spark, srcRoot, src, col("lang") === "de", Nil)
    tick()
    assertSynced()
    assert(AtomicCommit.readManifest(ix).get.entries.keySet === Set("fr"))

    // replayed tick: exactly-once no-op
    val v = AtomicCommit.currentVersion(ix).get
    tick()
    assert(AtomicCommit.currentVersion(ix).get === v)
  }
}
