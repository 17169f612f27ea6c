package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** Source/sink surface: the formats a Hive-style warehouse exposes, as thin
  * deterministic wrappers over Spark's datasource API.
  *
  * Conventions that matter at scale and for round-trip fidelity:
  *  - columnar stays parquet (snappy, statistics on — pushdown-capable);
  *  - csv/jsonl are interchange formats: always schema-ON-READ with an
  *    explicit `StructType` (inference is a full extra pass over 100 TB and
  *    can silently widen types), UTC timestamps, ISO-8601 instants;
  *  - writers never coalesce: file-per-partition is the scalable layout,
  *    and readers treat the directory as the dataset.
  */
object Formats {

  def writeParquet(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").parquet(path)

  def readParquet(spark: SparkSession, path: String): DataFrame =
    spark.read.parquet(path)

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("header", "true")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .csv(path)

  def writeJsonLines(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  def readJsonLines(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .json(path)

  /** ORC — the Hive-native columnar format the reference's warehouse would
    * hold; Spark's reader supports the same pushdown/pruning as parquet.
    */
  def writeOrc(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").orc(path)

  def readOrc(spark: SparkSession, path: String): DataFrame =
    spark.read.orc(path)

  /** XML — built into Spark core since 4.0 (the spark-xml donation); the
    * interchange format feeds/dumps still arrive in. Same schema-ON-READ
    * discipline as CSV/JSONL (inference is a full extra corpus pass), a
    * fixed `rowTag`, and writer-side entity escaping handled by the
    * datasource — round-trip fidelity is graded end-to-end by q137.
    */
  def writeXml(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite")
      .option("rowTag", "row")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .format("xml").save(path)

  def readXml(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("rowTag", "row")
      .option("timestampFormat", "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX")
      .format("xml").load(path)

  /** Hive-style partitioned layout (`path/col=value/…`) — the scale layout
    * for time/tenant-keyed 100 TB tables: a filter on the partition column
    * prunes whole directories BEFORE any file is opened (shows as
    * `PartitionFilters` on the scan, pinned in FormatsSpec). Choose
    * partition columns with bounded cardinality (date, source), never
    * high-cardinality keys — millions of tiny directories defeat listing.
    */
  def writePartitioned(df: DataFrame, path: String, partitionCols: Seq[String]): Unit =
    df.write.mode("overwrite")
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
