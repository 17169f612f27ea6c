package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** File-source runtime behavior the MemoryStream specs cannot see: the
  * offset log. A restarted query with the same checkpoint must resume
  * AFTER everything already committed — re-delivering none of it, and
  * picking up files that arrived while it was down. This is the
  * exactly-once contract every production file-fed pipeline (and the
  * driver's own per-round reruns) rides on.
  */
class FileStreamSpec extends SparkSpec {
  import spark.implicits._

  test("parquet file source + checkpoint: restart resumes from the offset log") {
    val in = Files.createTempDirectory("graft_fs_in").toString
    val out = Files.createTempDirectory("graft_fs_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_fs_ckpt").toString

    def land(ids: Range, tag: String): Unit =
      ids.map(i => (i.toLong, s"doc$i")).toDF("id", "text")
        .coalesce(1).write.mode("append").parquet(in)

    def runOnce(): Unit = {
      val q = spark.readStream
        .schema("id LONG, text STRING")
        .parquet(in)
        .withColumn("n_chars", length(col("text")))
        .writeStream
        .format("parquet")
        .option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
      q.exception.foreach(throw _)
    }

    land(0 until 100, "batch0")
    runOnce()
    val afterFirst = spark.read.parquet(out).count()
    assert(afterFirst === 100L)

    // query down; late files land
    land(100 until 150, "batch1")
    runOnce() // SAME checkpoint — must process ONLY the 50 new rows
    val sink = spark.read.parquet(out)
    assert(sink.count() === 150L, "restart re-delivered or dropped rows")
    // exactly-once per id, and the transform ran on the late batch too
    assert(sink.select("id").distinct().count() === 150L)
    assert(sink.filter(col("id") === 120 && col("n_chars") === lit("doc120".length)).count() === 1L)

    // the offset log is the mechanism — it must hold one entry per run
    val offsets = Paths.get(ckpt, "offsets").toFile.listFiles
    assert(offsets != null && offsets.length >= 2,
      s"expected >=2 offset-log entries, found ${Option(offsets).map(_.length)}")

    // a THIRD run with no new files commits nothing new
    runOnce()
    assert(spark.read.parquet(out).count() === 150L)
  }

  test("Sessionize custom state survives a restart: an open session closes with pre-restart events counted") {
    // flatMapGroupsWithState is the OTHER state path (user-defined state,
    // not the built-in dedup operator's) — its checkpoint recovery is a
    // separate runtime surface and gets its own pin
    val in = Files.createTempDirectory("graft_fss_in").toString
    val out = Files.createTempDirectory("graft_fss_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_fss_ckpt").toString
    val base = java.sql.Timestamp.valueOf("2024-01-01 10:00:00").getTime * 1000L
    def us(min: Int): Long = base + min.toLong * 60L * 1000000L
    def land(rows: Seq[(Long, Long, Long)]): Unit =
      rows.toDF("event_id", "ts_us", "user_id")
        .coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val sess = spark
      import sess.implicits._
      val events = spark.readStream
        .schema("event_id LONG, ts_us LONG, user_id LONG").parquet(in)
        .as[graft.streaming.Sessionize.UserEvent]
      val q = graft.streaming.Sessionize.sessionRows(events, gapMinutes = 30, lateMinutes = 10)
        .writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
      q.exception.foreach(throw _)
    }
    // run 1: user 1 opens a session (2 events, 10 min apart) — stays OPEN
    land(Seq((1L, us(0), 1L), (2L, us(10), 1L)))
    runOnce()
    assert(spark.read.schema("user_id LONG, session_start_us LONG, session_end_us LONG, n_events LONG")
      .parquet(out).count() === 0L, "session closed prematurely")
    // restart: a continuation event (within gap) then a gap-breaking one.
    // The close row can only say (start=10:00, n=3) if the OPEN-session
    // state crossed the restart; a state-losing restart would emit
    // (start=10:15, n=1) instead
    land(Seq((3L, us(15), 1L), (4L, us(120), 1L)))
    runOnce()
    val rows = spark.read.parquet(out)
      .select("user_id", "session_start_us", "session_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(rows.contains((1L, us(0), us(15), 3L)),
      s"restart lost flatMapGroupsWithState state: $rows")
    assert(!rows.exists { case (_, s0, _, n) => s0 == us(15) && n == 1L },
      s"state-loss signature present: $rows")
  }

  test("StreamDedup state survives a restart: a duplicate of a pre-restart doc is dropped") {
    val in = Files.createTempDirectory("graft_fsd_in").toString
    val out = Files.createTempDirectory("graft_fsd_out").toString + "/sink"
    val ckpt = Files.createTempDirectory("graft_fsd_ckpt").toString
    def ts(min: Int) = java.sql.Timestamp.valueOf(f"2024-01-01 10:$min%02d:00")
    def land(rows: Seq[(java.sql.Timestamp, String)]): Unit =
      rows.toDF("ts", "text").coalesce(1).write.mode("append").parquet(in)
    def runOnce(): Unit = {
      val deduped = graft.streaming.StreamDedup.dedupWithinWatermark(
        spark.readStream.schema("ts TIMESTAMP, text STRING").parquet(in),
        "ts", "text", "1 hour")
      val q = deduped.writeStream.format("parquet")
        .option("path", out).option("checkpointLocation", ckpt)
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination(120000)
      assert(!q.isActive)
      q.exception.foreach(throw _)
    }
    // run 1: A, B, dup-of-A within the horizon → A and B emit once
    land(Seq((ts(0), "doc alpha"), (ts(1), "doc beta"), (ts(2), "doc alpha")))
    runOnce()
    assert(spark.read.parquet(out).select("text").as[String].collect().sorted
      === Array("doc alpha", "doc beta"))
    // query down; a dup of B and a brand-new C land. The dedup STATE (B's
    // fingerprint) lives only in the checkpoint's state store — if restart
    // lost it, "doc beta" would re-emit
    land(Seq((ts(3), "doc beta"), (ts(4), "doc gamma")))
    runOnce()
    assert(spark.read.parquet(out).select("text").as[String].collect().sorted
      === Array("doc alpha", "doc beta", "doc gamma"),
      "restart lost (or re-delivered) dropDuplicatesWithinWatermark state")
  }
}
