package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Bucketized point-in-interval join.
  *
  * Spark plans a bare `p >= lo AND p < hi` theta join as a broadcast
  * nested loop — O(|points| · |intervals|) comparisons, a scale-killer the
  * moment neither side broadcasts. The classic fix is to discretize time
  * into fixed-width buckets: each interval is exploded to the buckets it
  * overlaps (⌈len/width⌉ + 1 rows), each point maps to exactly one bucket,
  * and the join becomes a hash-shuffle EQUI-join on bucket id with the
  * exact range predicate left as a residual filter. Completeness: a point
  * inside [lo, hi) shares the interval's bucket list by construction;
  * correctness: the residual re-checks the exact bounds, so bucketing only
  * generates candidates.
  *
  * `bucketWidthSec` tunes the trade: ≈ the typical interval length means
  * ~2 bucket rows per interval and ~|points in covering window| candidates
  * per point. Very long intervals explode into many buckets — width is the
  * caller's knob, same as every time-bucketed layout at 100 TB.
  */
object RangeJoin {

  /** Join each row of `points` to every row of `intervals` whose
    * [`loCol`, `hiCol`) contains `pointCol` (all three timestamp columns).
    * Output: all columns of both inputs; caller disambiguates names.
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame, pointCol: String,
                      loCol: String, hiCol: String,
                      bucketWidthSec: Long): DataFrame = {
    require(bucketWidthSec > 0)
    val n = points.sparkSession.sessionState.conf.numShufflePartitions
    val w = lit(bucketWidthSec)
    val iv = intervals.withColumn("_bkt",
      explode(sequence(floor(unix_timestamp(col(loCol)) / w),
        // ALWAYS include hi's own bucket: unix_timestamp truncates to whole
        // seconds, so on sub-second timestamps a point can share hi's
        // fractional second yet precede the exclusive bound — subtracting a
        // second before flooring (the old code) dropped that candidate
        // bucket and MISSED the match. The exact residual filter below
        // removes the (at most one bucket of) false positives this admits;
        // the greatest() guard keeps degenerate hi<lo inputs from making
        // sequence() run backwards
        greatest(floor(unix_timestamp(col(hiCol)) / w),
          floor(unix_timestamp(col(loCol)) / w)))))
    val pt = points.withColumn("_bkt", floor(unix_timestamp(col(pointCol)) / w))
      .repartition(n, col("_bkt"))
    pt.join(iv, Seq("_bkt"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) < col(hiCol))
      .drop("_bkt")
  }
}
