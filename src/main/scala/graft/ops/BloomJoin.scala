package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom-filter join pruning, built entirely from relational primitives.
  *
  * The 100 TB pattern: a fact-side scan feeding an equi-join pays for every
  * probe row twice — once in the scan, once in the shuffle — even when the
  * build side's filtered key set would reject most of them. Spark's own
  * runtime row-level bloom filter does this injection automatically only
  * for qualifying shuffle joins (and `might_contain` is not registered for
  * SQL in 4.1), so this operator makes the pattern explicit and tunable:
  *
  *  1. BUILD: each build-side key sets `numHashes` bit positions
  *     `pmod(xxhash64(key, salt, i), numBits)`; positions are folded into
  *     64-bit words with a `bit_or` aggregation — a partial+final agg whose
  *     state is at most `numBits/64` words regardless of key count — and
  *     the words collapse into ONE row holding a `map<int, bigint>`.
  *  2. PROBE: the 1-row bitmap broadcasts to every probe task (a
  *     `crossJoin(broadcast(...))` — the q85 1-row pattern, NOT a cartesian
  *     product) and membership is a pure codegen'd projection:
  *     `coalesce(element_at(map, pos div 64), 0) & (1 << pos % 64) != 0`
  *     for every hash. No shuffle touches the fact side until after it is
  *     pruned.
  *
  * False negatives are impossible (every inserted key's bits are set —
  * pinned in BloomJoinSpec), so following the probe with the exact
  * equi-join preserves semantics bit-for-bit; false positives only cost
  * the exact join a few extra rows (fpp ≈ (1 − e^(−k·n/m))^k; the default
  * m = 2^16 bits, k = 3 holds fpp < 1% up to n ≈ 5,000 keys). Sizing at
  * scale: the broadcast is `numBits/8` bytes of bitmap (m = 2^24 → 2 MiB,
  * good for ~1.7 M keys at 1% fpp); past tens of millions of build keys a
  * bitmap worth broadcasting no longer fits and the right tool is the
  * exact shuffled semi-join this operator short-circuits.
  */
object BloomJoin {

  /** Fold `keys(keyCol)` into a 1-row bitmap relation (column `graft_bloom`:
    * `map<int, bigint>` of non-zero 64-bit words). An empty build side
    * yields one row with an empty map — the probe then rejects everything,
    * which is the correct semi-join result.
    */
  def build(keys: DataFrame, keyCol: String, numBits: Int = 1 << 16,
            numHashes: Int = 3, salt: Long = 0L): DataFrame = {
    require(numBits > 0 && numBits % 64 == 0, s"numBits $numBits: need a positive multiple of 64")
    require(numHashes >= 1, s"numHashes $numHashes")
    val positions = (0 until numHashes).map(i =>
      pmod(xxhash64(col(keyCol), lit(salt), lit(i)), lit(numBits.toLong)))
    keys.select(explode(array(positions: _*)).as("pos"))
      .select(shiftright(col("pos"), 6).cast("int").as("word"),
        call_function("shiftleft", lit(1L), (col("pos") % 64).cast("int")).as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
      .agg(map_from_entries(collect_list(struct(col("word"), col("bits"))))
        .as("graft_bloom"))
  }

  /** Membership test for one key column against the broadcast `graft_bloom`
    * map — all `numHashes` bits must be set. Parameters MUST match the
    * `build` call's (different salt/size/hash-count silently tests a
    * different filter). Column-API construction (r8 ADVICE): safe for any
    * column name (no SQL splicing), and the per-hash position expression
    * appears as one shared subtree — word index and bit mask reference the
    * SAME `pos` Column, which whole-stage codegen's subexpression
    * elimination computes once per row per hash.
    */
  def mightContain(keyCol: String, numBits: Int = 1 << 16,
                   numHashes: Int = 3, salt: Long = 0L): Column =
    (0 until numHashes).map { i =>
      val pos = pmod(xxhash64(col(keyCol), lit(salt), lit(i)), lit(numBits.toLong))
      // pos ∈ [0, numBits): pos >> 6 IS pos div 64, and pos % 64 is exact
      val word = shiftright(pos, 6).cast("int")
      val mask = call_function("shiftleft", lit(1L), (pos % 64).cast("int"))
      coalesce(element_at(col("graft_bloom"), word), lit(0L))
        .bitwiseAND(mask) =!= lit(0L)
    }.reduce(_ && _)

  /** Prune `fact` to rows whose `keyCol` might be in the bloom filter:
    * superset of the true matches (no false negatives), so an exact join
    * downstream is unchanged semantically and cheaper physically.
    */
  def prune(fact: DataFrame, keyCol: String, bloom: DataFrame,
            numBits: Int = 1 << 16, numHashes: Int = 3,
            salt: Long = 0L): DataFrame = {
    require(!fact.columns.contains("graft_bloom"),
      "fact side already carries a graft_bloom column — rename it before pruning " +
        "(the probe would resolve the membership test against the wrong relation)")
    fact.crossJoin(broadcast(bloom))
      .filter(mightContain(keyCol, numBits, numHashes, salt))
      .drop("graft_bloom")
  }
}
