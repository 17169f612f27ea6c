package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** q47's runtime semantics: append-mode emission under a watermark, late-row
  * dropping, and batch≡stream equivalence for the windowed aggregations the
  * oracle grades in batch form (q44).
  */
class StreamingSpec extends SparkSpec {

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("append mode emits a window only after the watermark passes, and drops late rows") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val stream = MemoryStream[(Long, java.sql.Timestamp, String)]
    val agg = stream.toDF().toDF("event_id", "ts", "event_type")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("ws"), col("event_type"), col("n"))

    val ckpt = java.nio.file.Files.createTempDirectory("graft_wm_spec").toString
    val q = agg.writeStream.format("memory").queryName("wm_spec")
      .outputMode("append").option("checkpointLocation", ckpt).start()
    try {
      // batch 1: two rows in the 10:00 window
      stream.addData((1L, ts("2024-01-01 10:05:00"), "click"), (2L, ts("2024-01-01 10:20:00"), "click"))
      q.processAllAvailable()
      // watermark = 10:20 - 10min = 10:10 < 11:00 → nothing emitted yet
      assert(s.table("wm_spec").count() === 0)

      // batch 2: a row at 11:30 pushes the watermark past 11:00 → the 10:00
      // window closes and emits. Row 4 (10:07) arrives in the same batch:
      // it is below the watermark (10:10) but its WINDOW END (11:00) is not,
      // so Spark merges it into the still-open state — a row is "too late"
      // only when its whole window has closed. n = 3, not 2.
      stream.addData((3L, ts("2024-01-01 11:30:00"), "click"), (4L, ts("2024-01-01 10:07:00"), "click"))
      q.processAllAvailable()
      val emitted = s.table("wm_spec").collect()
      assert(emitted.length === 1)
      assert(emitted.head.getTimestamp(0) === ts("2024-01-01 10:00:00"))
      assert(emitted.head.getLong(2) === 3L) // includes the below-watermark row 4

      // batch 3: a 10:45 row AFTER the 10:00 window closed (window end 11:00
      // <= watermark 11:20) — genuinely late: dropped, no re-emission, and
      // the emitted count is immutable in append mode
      stream.addData((5L, ts("2024-01-01 10:45:00"), "click"))
      q.processAllAvailable()
      val after = s.table("wm_spec").collect()
      assert(after.length === 1)
      assert(after.head.getLong(2) === 3L)
    } finally q.stop()
  }

  test("q47 on the events table emits rows and is deterministic across runs") {
    // no cleanup between calls — the query must be re-runnable in-session
    val a = SparkEntry.queries("q47_stream_watermark")(spark, sf0001).collect()
    val b = SparkEntry.queries("q47_stream_watermark")(spark, sf0001).collect()
    assert(a.nonEmpty)
    assert(a.map(_.toString).toSeq === b.map(_.toString).toSeq)
  }

  test("session_window streaming equals q46's batch gaps-and-islands form") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val batch = SparkEntry.queries("q46_session_window")(spark, sf0001)
      .select("user_id", "session_start", "n_events")
      .collect().map(_.toString).toSet

    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("user_id"), col("value"))
      .as[(Long, java.sql.Timestamp, Long, Double)].collect()
    val stream = MemoryStream[(Long, java.sql.Timestamp, Long, Double)]
    val agg = stream.toDF().toDF("event_id", "ts", "user_id", "value")
      .groupBy(session_window(col("ts"), "30 minutes").as("w"), col("user_id"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("session_start"),
        col("n_events"))
    val q = agg.writeStream.format("memory").queryName("q46_stream")
      .outputMode("complete").start()
    try {
      stream.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = s.table("q46_stream")
        .select("user_id", "session_start", "n_events")
        .collect().map(_.toString).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("batch window agg (q44 form) equals streaming sessionless aggregation in complete mode") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    val batch = SparkEntry.queries("q44_tumbling_window")(spark, sf0001)
      .collect().map(_.toString).toSet

    val rows = Tables.events(spark, sf0001)
      .select(col("event_id"), col("ts"), col("event_type"), col("value"))
      .as[(Long, java.sql.Timestamp, String, Double)].collect()
    val stream = MemoryStream[(Long, java.sql.Timestamp, String, Double)]
    val agg = stream.toDF().toDF("event_id", "ts", "event_type", "value")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.exactSum(col("value")).as("sum_val"))
      .select(date_format(col("w.start"), "yyyy-MM-dd HH:mm:ss").as("ws"),
        col("event_type"), col("n"), col("sum_val"))
    val q = agg.writeStream.format("memory").queryName("q44_stream")
      .outputMode("complete").start()
    try {
      stream.addData(rows.toSeq)
      q.processAllAvailable()
      val streamed = s.table("q44_stream").collect().map(_.toString).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
