package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import graft.streaming.StreamDedup

/** Runtime semantics of the streaming exact-dedup operator: in-batch and
  * within-horizon duplicates are dropped, and — the bounded-state property
  * that makes the operator viable on an infinite stream — a key whose state
  * the watermark has evicted is emitted AGAIN when it reappears. The state
  * is a sliding-horizon dedup, not a global one, by design.
  */
class StreamDedupSpec extends SparkSpec {

  private val base = java.sql.Timestamp.valueOf("2026-01-01 10:00:00")
  private def at(min: Int) = new java.sql.Timestamp(base.getTime + min * 60000L)

  test("streaming dedup: duplicate handling across the watermark horizon") {
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    import spark.implicits._
    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val out = StreamDedup.dedupWithinWatermark(
      stream.toDF().toDF("doc_id", "ts", "text"), "ts", "text", "10 minutes")

    val ckpt = java.nio.file.Files.createTempDirectory("graft_sdedup_ckpt").toString
    spark.catalog.dropTempView("graft_sdedup_sink")
    val query = out.writeStream
      .format("memory").queryName("graft_sdedup_sink").outputMode("append")
      .option("checkpointLocation", ckpt)
      .start()
    try {
      // batch 1: exact dup ("X") and a normalized dup ("  x ") in ONE batch,
      // plus a distinct doc
      stream.addData(Seq((1L, at(0), "x"), (2L, at(0), "  X "), (3L, at(5), "y")))
      query.processAllAvailable()
      // batch 2: "x" again within the horizon (t=7 < t0 + 10min) → dropped;
      // "z" at t=30 advances the watermark to t=20, past x's t0+10 expiry
      stream.addData(Seq((4L, at(7), "x"), (5L, at(30), "z")))
      query.processAllAvailable()
      // batch 3: "x" at t=25 — not late (watermark t=20), state evicted → emitted
      stream.addData(Seq((6L, at(25), "x")))
      query.processAllAvailable()
    } finally query.stop()

    val rows = spark.table("graft_sdedup_sink")
      .select(col("doc_id"), col("fp")).collect()
      .map(r => r.getLong(0) -> r.getLong(1))
    val rowMap = rows.toMap
    val xFp = rowMap.getOrElse(1L, rowMap.getOrElse(2L, -1L)) // whichever of 1/2 survived
    // one survivor per (key, horizon): x from batch1, y, z, and x AGAIN after
    // its state expired
    assert(rows.length === 4, rows.mkString(","))
    assert(rows.count(_._2 == xFp) === 2, "x must re-emit after state eviction")
    assert(Set(4L).intersect(rows.map(_._1).toSet).isEmpty, "within-horizon dup must drop")
    assert(rows.map(_._1).toSet.contains(6L), "post-eviction reappearance must emit")
    // normalization: doc 1 ("x") and doc 2 ("  X ") carry the SAME fingerprint
    assert(rows.count(r => r._1 == 1L || r._1 == 2L) === 1)
  }

  test("batch parity: the same operator on a batch frame dedups on the fingerprint") {
    val docs = Tables.documents(spark, sf0001)
      .withColumn("ts", lit(base).cast("timestamp"))
    val streamedOp = StreamDedup.dedupWithinWatermark(docs, "ts", "text", "10 minutes")
    val expected = docs.withColumn("fp", StreamDedup.fingerprint("text"))
      .dropDuplicates("fp")
    assert(streamedOp.count() === expected.count())
  }
}
