package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{col, lit}

/** Exactly-once parquet SINK for `foreachBatch` — the output side of the
  * streaming story (sources, transforms, and state are covered by the
  * q44–q122 family; this is what makes the WRITE replay-safe).
  *
  * Structured streaming's failure contract is at-least-once delivery of
  * micro-batches to the sink function: after a crash, the last
  * uncommitted batch is REPLAYED with the SAME batchId and the same data.
  * A naive `append` sink therefore duplicates that batch's rows. The
  * idempotent form keys the physical layout by batch id —
  * `out/batch_id=<id>/` — and overwrites ONLY that partition (dynamic
  * partition overwrite), so a replayed batch replaces its own previous
  * attempt byte-for-byte and every other batch's data is untouched.
  * `(batchId, same input) → same files` makes the write a pure function
  * of the batch, which is exactly the definition of an exactly-once sink
  * built from at-least-once delivery.
  *
  * At 100 TB/day the same layout is what downstream consumers want
  * anyway: batch-id partitions are the unit of reprocessing, late
  * compaction, and retention deletes.
  */
object IdempotentSink {

  /** The `foreachBatch` body: write one micro-batch to its own
    * `batch_id=` partition, dynamic-overwrite mode. Safe to call twice
    * with the same id (replay) — the second call replaces the first.
    */
  def writeBatch(out: String)(df: DataFrame, batchId: Long): Unit =
    df.withColumn("batch_id", lit(batchId))
      .write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("batch_id")
      .parquet(out)

  /** Read the sink back as one relation (batch_id is a partition column). */
  def read(spark: org.apache.spark.sql.SparkSession, out: String): DataFrame =
    spark.read.parquet(out).drop(col("batch_id"))
}
