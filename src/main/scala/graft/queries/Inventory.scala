package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared query from SURVEY.md §2: a DataFrame builder plus, when the
  * semantics are deterministically SQL-expressible, the DuckDB oracle SQL
  * the driver hash-matches against.
  */
final case class Q(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String])

/** The full declared inventory (SURVEY.md §2.3) wired for SparkEntry. */
object Inventory {
  def all: Seq[Q] = {
    val qs = RelationalQueries.all ++
      TextQueries.all ++
      SimilarityQueries.all ++
      StreamingQueries.all ++
      PipelineQueries.all
    require(qs.map(_.name).distinct.size == qs.size,
      "duplicate query names in inventory: " +
        qs.groupBy(_.name).filter(_._2.size > 1).keys.mkString(", "))
    qs
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(sql => q.name -> sql)).toMap
}
