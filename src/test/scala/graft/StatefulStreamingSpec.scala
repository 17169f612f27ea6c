package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import graft.streaming.Sessionize
import graft.streaming.Sessionize.UserEvent

/** Custom streaming state (flatMapGroupsWithState) and watermarked
  * dedup — the stateful-API surface beyond windowed aggregation.
  */
class StatefulStreamingSpec extends SparkSpec {

  private def eventRows = {
    val s = spark
    import s.implicits._
    Tables.events(spark, sf0001)
      .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id"))
      .as[UserEvent].collect().sortBy(e => (e.ts_us, e.event_id))
  }

  test("flatMapGroupsWithState session counts equal the batch gaps-and-islands form") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    // ground truth: q46's batch sessionization, reduced to per-user counts
    val batch = SparkEntry.queries("q46_session_window")(spark, sf0001)
      .groupBy("user_id")
      .agg(count(lit(1)).as("n_sessions"), sum("n_events").as("n_events"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val rows = eventRows
    val (b1, b2) = rows.splitAt(rows.length / 2) // event-time ordered batches
    val stream = MemoryStream[UserEvent]
    val q = Sessionize.sessionCounts(stream.toDS(), 30).writeStream
      .format("memory").queryName("sess_state").outputMode("update").start()
    try {
      stream.addData(b1.toSeq); q.processAllAvailable()
      stream.addData(b2.toSeq); q.processAllAvailable()
    } finally q.stop()

    // last update per user is the final total
    val streamed = s.table("sess_state")
      .withColumn("rn", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("user_id").orderBy(col("n_events").desc)))
      .filter(col("rn") === 1).drop("rn")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(streamed === batch)
  }

  test("dropDuplicatesWithinWatermark drops a replayed event inside the horizon") {
    val s = spark
    import s.implicits._
    implicit val ctx: org.apache.spark.sql.SQLContext = s.sqlContext

    def ts(t: String) = java.sql.Timestamp.valueOf(t)
    val stream = MemoryStream[(Long, java.sql.Timestamp)]
    val deduped = stream.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.format("memory").queryName("ddww")
      .outputMode("append").start()
    try {
      stream.addData((1L, ts("2024-01-01 10:00:00")), (2L, ts("2024-01-01 10:01:00")))
      q.processAllAvailable()
      // replay id=1 within the watermark horizon → dropped
      stream.addData((1L, ts("2024-01-01 10:02:00")), (3L, ts("2024-01-01 10:03:00")))
      q.processAllAvailable()
    } finally q.stop()
    val ids = s.table("ddww").collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === Seq(1L, 2L, 3L))
  }
}
