package graft

import graft.streaming.IdempotentSink

class IdempotentSinkSpec extends SparkSpec {

  test("a replayed batch replaces its own partition; plain append would duplicate") {
    import spark.implicits._
    val out = Scratch.ephemeral("graft_sink_spec")
    val b0 = Seq((1L, "a"), (2L, "b")).toDF("id", "v")
    val b1 = Seq((3L, "c")).toDF("id", "v")
    IdempotentSink.writeBatch(out)(b0, 0L)
    IdempotentSink.writeBatch(out)(b1, 1L)
    // the at-least-once failure contract: batch 0 arrives AGAIN, same id
    IdempotentSink.writeBatch(out)(b0, 0L)
    val rows = IdempotentSink.read(spark, out)
      .collect().map(r => (r.getLong(0), r.getString(1))).sorted
    assert(rows.toSeq === Seq((1L, "a"), (2L, "b"), (3L, "c")),
      "replay must replace batch 0's partition, not append to it")
    // dynamic overwrite: replaying batch 0 must not touch batch 1
    // (asserted by (3,c) surviving above)

    // the failure mode the sink exists to prevent, demonstrated
    val naive = Scratch.ephemeral("graft_sink_naive")
    b0.write.mode("append").parquet(naive)
    b0.write.mode("append").parquet(naive)
    assert(spark.read.parquet(naive).count() === 4L,
      "control: an append sink duplicates the replayed batch")
  }
}
