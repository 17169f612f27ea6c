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
  /** `events.ts` has shipped in two parquet layouts across testdata
    * regenerations, so the loader branches on the OBSERVED Spark dtype
    * rather than assuming either one (the round-10 lesson: a hard-coded
    * assumption turned an environment drift into 18 runtime failures):
    *
    *  - INT64 TIMESTAMP(NANOS): Spark's vectorized reader rejects it unless
    *    `spark.sql.legacy.parquet.nanosAsLong=true` surfaces it as raw
    *    LongType nanos. Truncate to µs exactly like DuckDB's
    *    TIMESTAMP_NS→TIMESTAMP cast (integer floor-division; all epoch
    *    values positive) so boundary comparisons agree to the microsecond.
    *  - TIMESTAMP(MICROS) (isAdjustedToUTC either way → Spark TIMESTAMP_NTZ
    *    or TIMESTAMP): already µs; cast to session-TZ TimestampType. Under
    *    the pinned UTC session the NTZ→TZ cast is value-identical, and it
    *    keeps every downstream output schema (and the driver's
    *    schema_match) the same as the nanos path produced.
    *
    * The legacy conf is consulted at scan EXECUTION, not at `read` time, so
    * it cannot be set-and-restored here; entry-point builders set it
    * session-wide. It only matters on the nanos layout, so the loud
    * `require` is scoped to that branch.
    */
  def events(s: SparkSession, d: String): DataFrame = {
    val raw = load(s, d, "events")
    import org.apache.spark.sql.types._
    raw.schema("ts").dataType match {
      case LongType =>
        require(s.conf.getOption("spark.sql.legacy.parquet.nanosAsLong").contains("true"),
          "events.parquet holds INT64 TIMESTAMP(NANOS): build the session with " +
            "spark.sql.legacy.parquet.nanosAsLong=true (see Tables.events scaladoc)")
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampType | TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast(TimestampType))
      case other =>
        sys.error(s"events.ts: unsupported parquet-surfaced dtype $other " +
          "(expected raw INT64 nanos or a µs timestamp)")
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = load(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame = load(s, d, "embeddings")
}
