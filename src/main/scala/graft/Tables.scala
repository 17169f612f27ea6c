package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Parquet table loaders for the driver-generated test corpus
  * (TESTDATA.md: one parquet file per table under the sf dir).
  *
  * At 100 TB these reads become multi-file partitioned scans; nothing here
  * assumes a single file — `spark.read.parquet` takes directories too.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame    = load(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame    = load(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame  = load(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame  = load(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame      = load(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame    = load(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame  = load(s, d, "lineitem")
  /** `events.ts` is parquet INT64 TIMESTAMP(NANOS) — a type Spark's vectorized
    * reader rejects outright. Read it as raw nanos (legacy conf) and truncate
    * to µs exactly like DuckDB's TIMESTAMP_NS→TIMESTAMP cast does (integer
    * floor-division; all epoch values are positive), so boundary comparisons
    * agree between the engines to the microsecond.
    *
    * The legacy conf is consulted at scan EXECUTION, not at `read` time, so
    * it cannot be set-and-restored here; it must be session-wide. All
    * entry-point builders (Bench/Verify/TimeQuery/Smoke/Explain/SparkSpec)
    * set it; a loader must not mutate shared session state as a side
    * effect, so any other session fails loudly instead.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
      "events.parquet holds INT64 TIMESTAMP(NANOS): build the session with " +
        "spark.sql.legacy.parquet.nanosAsLong=true (see Tables.events scaladoc)")
    load(s, d, "events")
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
