package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{StructField, StructType}

/** Sorted-neighborhood blocking (Hernández & Stolfo 1995) in its
  * DISTRIBUTED form: pair every record with its `w` successors in the
  * GLOBAL sort order of the fuzzy key, at O(n·w) candidates, without ever
  * funnelling the corpus through one task.
  *
  * The naive Spark spelling — `lead(...).over(Window.orderBy(key))` — is a
  * single-partition window (Spark warns "No Partition Defined"): the whole
  * table sorts through one task. The common dodge, partitioning the window
  * by a key prefix, caps parallelism at the prefix's cardinality (26 for a
  * first-letter prefix) and silently drops cross-prefix neighbor pairs.
  * This operator keeps both properties:
  *
  *  1. `repartitionByRange(parts, sortCols).sortWithinPartitions(sortCols)`
  *     — a distributed total sort (Spark's RangePartitioner samples key
  *     boundaries; ~n/parts rows per task).
  *  2. The first `w` rows of every partition are collected to the driver
  *     (`parts × w` rows — the same order of driver state as the
  *     RangePartitioner's own boundary sample) and broadcast.
  *  3. Each partition pairs its rows with a sliding window of `w`
  *     successors, extending past its end into the broadcast heads of the
  *     FOLLOWING partitions — taking the first `w` of their concatenation
  *     handles runt/empty partitions (a successor may live 2+ partitions
  *     ahead when intermediate ones hold < w rows). Overlap rows are
  *     successors only, never anchors, so no pair is emitted twice.
  *
  * Output is exactly the pair set of the single-ORDER-BY window form —
  * verified against that oracle in q147 — with parallelism `parts` instead
  * of 1 (or 26). `mapPartitions` is justified here (SURVEY §3 ladder):
  * the per-partition sliding buffer is genuinely imperative state that no
  * built-in window can express WITH the cross-partition overlap.
  *
  * Scale: at 100 TB, `parts` tracks the cluster (e.g. 4×cores); driver
  * state stays `parts × w` rows of the projected columns — project before
  * calling (the q147 call site carries only key+name).
  */
object SortedNeighborhood {

  /** Candidate pairs `(a, b)` where `b` is one of `a`'s `w` successors in
    * the global `sortCols` order. `sortCols` must be a total order (append
    * a unique tiebreaker column) — ties straddling a range-partition
    * boundary would otherwise make the pairing nondeterministic.
    *
    * Returns `a_<col>` / `b_<col>` for every input column, plus `dist`
    * (1-based neighbor rank ≤ w) — callers verify candidates with their
    * own similarity predicate.
    */
  def pairs(df: DataFrame, sortCols: Seq[String], w: Int, parts: Int): DataFrame = {
    require(w >= 1, s"window must be >= 1, got $w")
    require(parts >= 1, s"parts must be >= 1, got $parts")
    val spark = df.sparkSession
    val cols = df.columns.toSeq
    // r20: materialize the range sort ONCE (eager local checkpoint) — the
    // head-collect job and the pair-generation job are two separate
    // actions over this RDD, so the un-materialized form paid the range
    // sort (plus the RangePartitioner's boundary-sampling job) twice per
    // pass. The checkpoint blocks are ContextCleaner-released when the
    // caller drops the returned pair relation.
    val sorted = df
      .repartitionByRange(parts, sortCols.map(df.col): _*)
      .sortWithinPartitions(sortCols.map(df.col): _*)
      .localCheckpoint(true)
    val rdd = sorted.rdd
    // first w rows of each partition — bounded driver state (parts × w)
    val heads: Map[Int, Array[Row]] = rdd
      .mapPartitionsWithIndex((pid, it) => Iterator.single(pid -> it.take(w).toArray))
      .collect().toMap
    val nParts = rdd.getNumPartitions
    val bcHeads = spark.sparkContext.broadcast(heads)
    val pairRdd = rdd.mapPartitionsWithIndex { (pid, it) =>
      // successors that spill past this partition's end: first w rows of
      // the following partitions' concatenated heads (runt-safe)
      val overlap = (pid + 1 until nParts).iterator
        .flatMap(p => bcHeads.value.getOrElse(p, Array.empty[Row]))
        .take(w)
      // sliding window of the previous w rows. EVERY row advances the
      // window (an overlap row that didn't would let the last real anchors
      // pair past distance w); only this partition's own rows may ANCHOR a
      // pair (overlap rows are some other partition's anchors).
      val window = scala.collection.mutable.Queue.empty[(Row, Boolean)]
      (it.map(r => (r, true)) ++ overlap.map(r => (r, false))).flatMap {
        case (row, isAnchor) =>
          val out = window.iterator.zipWithIndex.collect {
            case ((a, true), i) => Row(a, row, window.size - i)
          }.toArray
          window.enqueue((row, isAnchor))
          if (window.size > w) { window.dequeue(); () }
          out.iterator
      }
    }
    val side = StructType(df.schema.fields)
    val pairSchema = StructType(Seq(
      StructField("a", side, nullable = false),
      StructField("b", side, nullable = false),
      StructField("dist", org.apache.spark.sql.types.IntegerType, nullable = false)))
    val flat: Seq[Column] =
      cols.map(c => org.apache.spark.sql.functions.col(s"a.$c").as(s"a_$c")) ++
      cols.map(c => org.apache.spark.sql.functions.col(s"b.$c").as(s"b_$c")) :+
      org.apache.spark.sql.functions.col("dist")
    spark.createDataFrame(pairRdd, pairSchema).select(flat: _*)
  }

  /** Hernández & Stolfo's ACTUAL method is multi-pass: one sorted sweep
    * per key ordering (last-name-first, address-first, …), candidate sets
    * UNIONED — a true match missed by one ordering (a typo in its leading
    * field sorts it far away) is usually caught by another. One [[pairs]]
    * sweep per entry of `keys` (each ordering gets `idCol` appended as the
    * total-order tiebreaker), then pair-level dedup: a pair found under
    * several orderings — possibly with opposite orientation — counts once,
    * canonicalized to `a_<idCol> <= b_<idCol>` with `dist` the MINIMUM
    * neighbor rank across passes.
    *
    * Scale: K passes cost K independent range-sorts of O(n·w) candidates
    * each; the dedup is one hash aggregation keyed by the pair — no
    * all-pairs step anywhere. Driver state stays K × parts × w rows.
    */
  def multiPass(df: DataFrame, idCol: String, keys: Seq[Seq[String]],
                w: Int, parts: Int): DataFrame = {
    require(keys.nonEmpty, "multiPass needs at least one key ordering")
    require(df.columns.contains(idCol), s"no id column '$idCol'")
    import org.apache.spark.sql.functions.{col, min, when}
    val cols = df.columns.toSeq
    val unioned = keys
      .map(k => pairs(df, if (k.contains(idCol)) k else k :+ idCol, w, parts))
      .reduce(_.unionByName(_))
    val keepOrder = col(s"a_$idCol") <= col(s"b_$idCol")
    val canonical: Seq[Column] =
      cols.map(c => when(keepOrder, col(s"a_$c")).otherwise(col(s"b_$c")).as(s"a_$c")) ++
      cols.map(c => when(keepOrder, col(s"b_$c")).otherwise(col(s"a_$c")).as(s"b_$c")) :+
      col("dist")
    unioned.select(canonical: _*)
      .groupBy(cols.map(c => col(s"a_$c")) ++ cols.map(c => col(s"b_$c")): _*)
      .agg(min(col("dist")).as("dist"))
  }
}
