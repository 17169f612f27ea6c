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

  /** Order-insensitive exact sum of a ≤2-dp double column, surfaced as
    * DOUBLE. The sum itself is decimal (exact, associative at any
    * parallelism); only the final value is converted — one correctly-rounded
    * decimal→double conversion, identical on both engines while the unscaled
    * sum stays below 2^53 (true by orders of magnitude at every SF).
    *
    * Output columns must never stay DECIMAL: engines render decimals with
    * trailing zeros ("12.50") where doubles render shortest ("12.5"), and a
    * text-normalizing hash compare will flag every value whose last decimal
    * digit is 0. Doubles have one canonical shortest repr on both engines.
    */
  def exactSum(c: Column): Column = sum(dec2(c)).cast("double")

  /** Exact sum of dec2(a)·dec2(b) products (4-dp exact), as DOUBLE. Both
    * factors are forced decimal here — a raw-double factor would silently
    * promote the whole product to an order-sensitive double sum.
    */
  def exactSumProd(a: Column, b: Column): Column =
    sum(dec2(a) * dec2(b)).cast("double")

  /** Deterministic average: exact sum, single division, 4-dp round. */
  def exactAvg(c: Column): Column =
    round(sum(dec2(c)).cast("double") / count(lit(1)), 4)

  /** 6-dp rounded similarity score for output columns.
    *
    * TIE CAVEAT (found by the r8 sf0.1 parity audit): when the value
    * being rounded is the RATIO OF EXACTLY-AGREED INTEGERS a/n, the true
    * rational lands EXACTLY on a 6-dp tie whenever a ≡ n/2 (mod n) — and
    * rounding the nearest double at a true tie is an engine coin-flip
    * (Spark rounds the double's exact binary value; DuckDB rounds its
    * shortest decimal repr — they disagree when the binary value sits
    * just below a tie whose shortest repr IS the tie string). For such
    * ratio outputs, do the half-up division in exact integer arithmetic
    * instead: `(2·a + n) div (2·n)` at the output scale, then one exact
    * small-int→double conversion and one division by the scale power
    * (q86's protocol). round6 stays correct for values that are already
    * engine-agreed doubles NOT of that ratio form, where a tie landing is
    * measure-zero rather than structural.
    */
  def round6(c: Column): Column = round(c, 6)

  /** Deterministic sample stddev: exact decimal sums (order-insensitive),
    * then one fixed sequence of IEEE double ops identical on both engines:
    * sqrt((n·Σx² − (Σx)²) / (n·(n−1))). The sums are exact — 2-dp inputs
    * make dec2(c)·dec2(c) a 4-dp-exact decimal(37,4) product, summed as
    * decimal(38,4) — so the decimal→double casts are deterministic and the
    * rest is bit-identical IEEE arithmetic. (A pure-decimal formula would
    * need precision 77 for n·Σx² and Spark caps decimals at 38.)
    */
  def exactStddev(c: Column): Column = {
    val n   = count(lit(1)).cast("double")
    val sx  = sum(dec2(c)).cast("double")
    val sxx = sum(dec2(c) * dec2(c)).cast("double")
    round(sqrt((n * sxx - sx * sx) / (n * (n - lit(1.0)))), 4)
  }
}
