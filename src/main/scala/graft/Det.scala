package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Determinism helpers — every graded query flows through these so its
  * output hash-matches a DuckDB oracle run (SURVEY.md §2.1).
  *
  * Core rules:
  *  - never hash-compare a raw SUM(double): summation order differs between
  *    engines. All value columns in the corpus carry ≤2 decimal digits
  *    (FIXTURES.md), so CAST to DECIMAL(18,2) is exact and the sum is exact
  *    and associative in any order, on any engine, at any parallelism.
  *  - averages: exact decimal sum, one IEEE division, then ROUND — identical
  *    bit pattern on both engines.
  *  - similarity scores: ROUND(sim, 6) in the *output*; raw doubles for
  *    internal comparisons.
  *
  * These rules are scale-invariant: a 1000-executor cluster shuffles and
  * combines partial aggregates in arbitrary order, which is exactly why the
  * exact-decimal discipline matters beyond the oracle gate.
  */
object Det {
  /** Exact 2-dp decimal view of a ≤2-dp double column. */
  def dec2(c: Column): Column = c.cast("decimal(18,2)")

  /** Wider decimal for sums of squares (2-dp × 2-dp = 4-dp exact). */
  def dec4(c: Column): Column = c.cast("decimal(38,4)")

  /** Order-insensitive exact sum of a ≤2-dp double column. */
  def exactSum(c: Column): Column = sum(dec2(c))

  /** Deterministic average: exact sum, single division, 4-dp round. */
  def exactAvg(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 4)

  /** 6-dp rounded similarity score for output columns. */
  def round6(c: Column): Column = round(c, 6)

  /** Deterministic sample stddev from exact decimal sums:
    * sqrt((n*Σx² − (Σx)²) / (n*(n−1))). Avoids stddev_samp whose
    * accumulation order is engine-dependent.
    */
  def exactStddev(c: Column): Column = {
    val n   = count(lit(1)).cast("decimal(38,4)")
    val sx  = sum(dec4(c))
    val sxx = sum(dec4(c) * dec4(c))
    round(sqrt(((n * sxx - sx * sx) / (n * (n - lit(1)))).cast("double")), 4)
  }
}
