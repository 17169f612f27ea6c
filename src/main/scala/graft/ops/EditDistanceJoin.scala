package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Q-gram prefix-filtered edit-distance self-join (Ed-Join, Xiao/Wang/Lin
  * VLDB 2008), Spark-first.
  *
  * The brute-force plan enumerates every same-block pair — O(block²)
  * candidates, quadratic in the hot block at scale. Ed-Join's prune: one
  * edit operation destroys at most `q` of a string's distinct q-grams, so
  * ed(a, b) ≤ k implies b still contains all but ≤ q·k of a's grams. With
  * grams ordered by a global total order (ascending document frequency —
  * rarest first, which is also the skew killer), the standard prefix-filter
  * lemma then guarantees any true pair shares ≥ 1 gram inside both
  * (q·k + 1)-length prefixes. Candidate generation becomes an equi-join on
  * (block…, prefix gram) — linear in the inverted-index fan-out instead of
  * quadratic in the block.
  *
  * Completeness edge: a string with ≤ q·k distinct grams (short or highly
  * repetitive) can lose its ENTIRE gram set within k edits — e.g. q=2, k=2:
  * ed("ab", "cd") = 2 with zero shared grams — so the prefix argument gives
  * no guarantee for pairs touching such strings. Those strings are routed
  * to a brute-force bucket (short × everything in-block); on natural text
  * the bucket is empty-to-tiny, and the split keeps the operator exactly
  * equal to the brute-force join (property-pinned in SimilarityJoinSpec).
  *
  * Verification is the thresholded `levenshtein(a, b, k)` built-in (banded
  * O(n·k) with early exit), behind the |len(a) − len(b)| ≤ k hard bound.
  * Plan shape: gram-frequency agg → per-record prefix (≤ q·k + 1 grams) →
  * one shuffle for the (block, gram) candidate equi-join → pair dedup →
  * codegen verification. No collect, no cartesian, no global window.
  */
object EditDistanceJoin {

  /** All pairs (a, b) with a.id < b.id, equal block keys, and
    * edit-distance(a.str, b.str) ≤ k. Output: (a_id, b_id, blockCols…,
    * dist), totally ordered by (a_id, b_id).
    *
    * `vocabBroadcast` dispatches the gram-frequency join exactly like
    * [[SimilarityJoin.freqJoined]] (None = bounded auto-probe).
    */
  def selfJoin(df: DataFrame, idCol: String, strCol: String,
               blockCols: Seq[String], k: Int, q: Int = 2,
               vocabBroadcast: Option[Boolean] = None): DataFrame = {
    require(k >= 0 && q >= 1, s"need k >= 0 and q >= 1, got k=$k q=$q")
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val prefLen = q * k + 1

    val base = df
      .select(col(idCol).as("id") +: col(strCol).as("s") +: blockCols.map(col): _*)
      .withColumn("len", length(col("s")))
      // guard: sequence(1, len-q+1) runs DESCENDING when len < q — emit an
      // empty gram set instead (such strings go to the brute bucket anyway)
      .withColumn("grams",
        when(col("len") >= q,
          array_distinct(transform(sequence(lit(1), col("len") - q + 1),
            i => col("s").substr(i, lit(q)))))
          .otherwise(array().cast("array<string>")))
      .withColumn("m", size(col("grams")))

    val longs = base.filter(col("m") >= prefLen)
    val shorts = base.filter(col("m") < prefLen)

    // global gram order = ascending (document frequency, gram) over the
    // prefix-eligible strings; any total order is sound, rarest-first
    // minimizes candidate fan-out AND keeps hot grams out of the index
    val freq = longs
      .select(explode(col("grams")).as("gram"))
      .groupBy("gram")
      .agg(count(lit(1)).as("df"))

    val ranked = SimilarityJoin.freqJoined(
        longs.select(col("id") +: col("len") +: col("s") +: blockCols.map(col) :+
          explode(col("grams")).as("gram"): _*),
        freq, "gram", vocabBroadcast)
      .groupBy(col("id") +: col("len") +: col("s") +: blockCols.map(col): _*)
      .agg(sort_array(collect_list(struct(col("df"), col("gram")))).as("rg"))
      .withColumn("prefix", slice(col("rg.gram"), 1, prefLen))
      .drop("rg")

    val a = ranked.select(col("id").as("a_id") +: col("len").as("a_len") +:
      col("s").as("a_s") +: explode(col("prefix")).as("g") +:
      blockCols.map(c => col(c).as(s"a_$c")): _*)
    val b = ranked.select(col("id").as("b_id") +: col("len").as("b_len") +:
      col("s").as("b_s") +: explode(col("prefix")).as("b_g") +:
      blockCols.map(c => col(c).as(s"b_$c")): _*)

    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
    val cond = ((col("g") === col("b_g")) +: blockEq).reduce(_ && _) &&
      col("a_id") < col("b_id") &&
      abs(col("a_len") - col("b_len")) <= k

    // explicit-count spread: the pre-explode input is tiny, AQE would
    // coalesce a plain repartition and serialize candidate generation
    val candLL = a.repartition(n, col("g") +: blockCols.map(c => col(s"a_$c")): _*)
      .join(b, cond)
      .select(col("a_id") +: col("b_id") +: col("a_s") +: col("b_s") +:
        blockCols.map(c => col(s"a_$c").as(c)): _*)

    // brute bucket: prefix-ineligible strings against everything in-block
    // (covers short×short and short×long; dedup canonicalizes the double
    // match when both sides are short)
    val sh = shorts.select(col("id").as("s_id") +: col("len").as("s_len") +:
      col("s").as("s_s") +: blockCols.map(c => col(c).as(s"s_$c")): _*)
    val all = base.select(col("id").as("t_id") +: col("len").as("t_len") +:
      col("s").as("t_s") +: blockCols.map(c => col(c).as(s"t_$c")): _*)
    val shBlockEq = blockCols.map(c => col(s"s_$c") === col(s"t_$c"))
    val candS = sh
      .join(all, (shBlockEq :+ (col("s_id") =!= col("t_id"))).reduce(_ && _) &&
        abs(col("s_len") - col("t_len")) <= k)
      .select(least(col("s_id"), col("t_id")).as("a_id") +:
        greatest(col("s_id"), col("t_id")).as("b_id") +:
        when(col("s_id") < col("t_id"), col("s_s")).otherwise(col("t_s")).as("a_s") +:
        when(col("s_id") < col("t_id"), col("t_s")).otherwise(col("s_s")).as("b_s") +:
        blockCols.map(c => col(s"s_$c").as(c)): _*)

    candLL.unionByName(candS)
      .dropDuplicates("a_id", "b_id")
      // thresholded form returns -1 past the bound — keep genuine 0..k
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), k))
      .filter(col("dist").between(0, k))
      .select(col("a_id") +: col("b_id") +: blockCols.map(col) :+ col("dist"): _*)
      .orderBy("a_id", "b_id")
  }

  /** Brute-force reference form (same contract): every same-block pair,
    * length-pruned, thresholded-levenshtein verified. O(block²) candidates —
    * the correctness oracle for [[selfJoin]] and the right choice only when
    * blocks are known-tiny.
    */
  def selfJoinBrute(df: DataFrame, idCol: String, strCol: String,
                    blockCols: Seq[String], k: Int): DataFrame = {
    val n = df.sparkSession.sessionState.conf.numShufflePartitions
    val a = df.select(col(idCol).as("a_id") +: col(strCol).as("a_s") +:
        blockCols.map(c => col(c).as(s"a_$c")): _*)
      .repartition(n, col("a_id"))
    val b = df.select(col(idCol).as("b_id") +: col(strCol).as("b_s") +:
      blockCols.map(c => col(c).as(s"b_$c")): _*)
    val blockEq = blockCols.map(c => col(s"a_$c") === col(s"b_$c"))
    a.join(b, (blockEq :+ (col("a_id") < col("b_id"))).reduce(_ && _) &&
        abs(length(col("a_s")) - length(col("b_s"))) <= k)
      .withColumn("dist", levenshtein(col("a_s"), col("b_s"), k))
      .filter(col("dist").between(0, k))
      .select(col("a_id") +: col("b_id") +: blockCols.map(c => col(s"a_$c").as(c)) :+ col("dist"): _*)
      .orderBy("a_id", "b_id")
  }
}
