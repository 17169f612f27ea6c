package graft.sources

import org.apache.spark.sql.DataFrame

/** Bucketed table layout: the co-located join story.
  *
  * Writing both sides of a recurring equi-join bucketed (and sorted) by the
  * join key hash-places matching rows in same-numbered buckets, so the join
  * plans with ZERO exchanges — at 100 TB that turns the nightly
  * fact-to-fact join from the dominant shuffle into a local merge per
  * bucket. Bucket count is the join's parallelism: pick it for target-SF
  * bucket sizes (~128-512 MB), not for today's toy input.
  */
object Bucketing {

  /** Write `df` as a managed parquet table bucketed+sorted by `keys`. */
  def writeBucketed(df: DataFrame, table: String, keys: Seq[String], nBuckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(nBuckets, keys.head, keys.tail: _*)
      .sortBy(keys.head, keys.tail: _*)
      .format("parquet")
      .saveAsTable(table)
}
