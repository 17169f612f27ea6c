package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-salted two-phase aggregation.
  *
  * A `groupBy(key).agg(sum)` on a Zipfian key sends every row of the hot
  * key to one reducer. Salting splits each key into `nSalts` sub-keys for
  * the first (partial) aggregation, then combines the per-salt partials in
  * a second, tiny aggregation keyed on the original key — the hot key's
  * rows now spread over `nSalts` reducers and the second shuffle carries at
  * most `distinct keys × nSalts` rows regardless of input volume.
  *
  * The salt is derived from deterministic row content (xxhash64 of the
  * salt-by columns), never from randomness or partition ids, so results
  * are reproducible run-to-run — required by the determinism contract and
  * for AQE re-execution safety.
  *
  * Note Spark's own partial aggregation already handles most skew for
  * algebraic aggregates when map-side rows of the hot key co-occur in
  * input partitions; explicit salting matters when upstream layout puts a
  * hot key's rows in many partitions and the combined per-partition
  * partials are still reducer-bound, or for high-cardinality state like
  * collect_list. AQE's skew-join splitting covers joins, not aggregations.
  */
object Salting {

  /** Salted exact decimal sum + count per key. `saltBy` names columns whose
    * hashed content spreads the hot keys (value-bearing columns work well).
    */
  def saltedSumCount(df: DataFrame, keyCols: Seq[String], valueCol: String,
                     saltBy: Seq[String], nSalts: Int = 16): DataFrame = {
    val salt = pmod(xxhash64(saltBy.map(col): _*), lit(nSalts.toLong))
    df.withColumn("_salt", salt)
      .groupBy((keyCols :+ "_salt").map(col): _*)
      .agg(sum(graft.Det.dec2(col(valueCol))).as("_psum"),
        count(lit(1)).as("_pcnt"))
      .groupBy(keyCols.map(col): _*)
      .agg(sum(col("_psum")).cast("double").as("sum_val"),
        sum(col("_pcnt")).as("n"))
  }
}
