package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
import graft.queries.Inventory

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Flagship = q36 token-Jaccard self-join (SURVEY.md §2 row 36).
    */
  def entry(spark: SparkSession): DataFrame =
    queries("q36_jaccard_self_join")(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Inventory.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Inventory.oracleSql
}
