package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Det

/** MinHash + LSH approximate set-similarity (Broder 1997; banding analysis
  * as in Mining of Massive Datasets ch. 3).
  *
  * Signature: h_i(S) = min over tokens t of (a_i·x(t) + b_i) mod p, with
  * x(t) = xxhash64(t) mod p and p = 2^31 − 1. The (a_i, b_i) come from a
  * fixed-seed splitmix sequence — plan-time constants, so a signature is a
  * pure deterministic function of the token set. E[matches/n] = J(A,B).
  *
  * LSH: the n-hash signature is cut into b bands of r rows; a pair is a
  * candidate iff some band hashes equal. Candidate generation is an
  * equi-join on (band index, band hash) — a hash shuffle, never all-pairs.
  * With n=32, b=8, r=4: P(candidate | J=0.8) = 1−(1−0.8⁴)⁸ ≈ 0.985, and
  * P(candidate | J=0.3) ≈ 0.06 — the classic S-curve.
  *
  * No SQL oracle (engine hash functions differ); verified by property
  * tests against the exact join's ground truth (fixed seeds ⇒ stable).
  */
object MinHash {
  val P: Long = 2147483647L // 2^31 − 1, prime; keeps a·x within a Long

  /** Fixed-seed splitmix64 stream → (a, b) hash parameters, a ∈ [1,p), b ∈ [0,p). */
  private[graft] def params(n: Int, seed: Long = 42L): Seq[(Long, Long)] = {
    var x = seed
    def next(): Long = {
      x += 0x9e3779b97f4a7c15L
      var z = x
      z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
      z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
      z = z ^ (z >>> 31)
      z >>> 1 // non-negative
    }
    Seq.fill(n)((next() % (P - 1) + 1, next() % P))
  }

  /** Adds a `sig` column: array<long> of nHashes min-hash values over the
    * distinct tokens of `textCol`.
    *
    * Plan shape: explode tokens → xxhash64 once per (doc, token) → one hash
    * aggregation with nHashes `min` columns. Everything stays inside
    * whole-stage codegen (higher-order `transform` lambdas do not, and an
    * array_min-of-transform formulation measures ~4× slower at sf0.1). The
    * single shuffle is by doc id with map-side partial mins, so shuffled
    * bytes are docs × nHashes longs regardless of document length — the
    * right trade at 100 TB, where token explosion is map-local.
    */
  def signatures(docs: DataFrame, idCol: String, textCol: String,
                 nHashes: Int = 32, keep: Seq[String] = Nil): DataFrame = {
    val ps = params(nHashes)
    val carry = keep
    val base = SimilarityJoin.tokenized(docs, textCol)
      .select(col(idCol).as("id") +: carry.map(col) :+ explode(col("tokens")).as("tok"): _*)
      .withColumn("hx", pmod(xxhash64(col("tok")), lit(P)))
    val mins = ps.zipWithIndex.map { case ((a, b), i) =>
      min(pmod(lit(a) * col("hx") + lit(b), lit(P))).as(s"_mh$i")
    }
    base.groupBy(col("id") +: carry.map(col): _*)
      .agg(mins.head, mins.tail: _*)
      .withColumn("sig", array((0 until nHashes).map(i => col(s"_mh$i")): _*))
      .drop((0 until nHashes).map(i => s"_mh$i"): _*)
  }

  /** LSH candidate pairs with MinHash-estimated Jaccard.
    *
    * Output (a_id, b_id, est_sim ROUND 6) for candidate pairs (≥1 equal
    * band, equal block keys, a < b) with est_sim ≥ tauEst, totally ordered.
    */
  def lshPairs(docs: DataFrame, idCol: String, textCol: String,
               blockCols: Seq[String], tauEst: Double,
               nHashes: Int = 32, nBands: Int = 8): DataFrame = {
    require(nHashes % nBands == 0)
    val rows = nHashes / nBands
    val signed = signatures(docs, idCol, textCol, nHashes, keep = blockCols)
      .withColumn("bands", array((0 until nBands).map(bi =>
        hash(slice(col("sig"), bi * rows + 1, rows))): _*))

    def side(p: String) = signed.select(
      col("id").as(s"${p}_id") +: col("sig").as(s"${p}_sig") +:
        blockCols.map(c => col(c).as(s"${p}_$c")) :+
        posexplode(col("bands")).as(Seq(s"${p}_band", s"${p}_bh")): _*)

    val a = side("a")
    val b = side("b")
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
    val cond = (Seq(col("a_band") === col("b_band"), col("a_bh") === col("b_bh"),
      col("a_id") < col("b_id")) ++ blockEq).reduce(_ && _)

    val nMatch = size(filter(zip_with(col("a_sig"), col("b_sig"), (x, y) => x === y),
      (m: Column) => m))
    // estimate computed BEFORE the pair dedup so the dedup shuffle carries
    // (a_id, b_id, est) instead of two nHashes-long signatures per row
    a.join(b, cond)
      .withColumn("est_sim", nMatch.cast("double") / lit(nHashes.toDouble))
      .groupBy("a_id", "b_id").agg(max(col("est_sim")).as("est_sim"))
      .filter(col("est_sim") >= tauEst)
      .select(col("a_id"), col("b_id"), Det.round6(col("est_sim")).as("est_sim"))
      .orderBy("a_id", "b_id")
  }
}
