package graft.ops

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed BPE merge learning (Sennrich/Haddow/Birch 2016) — the
  * tokenizer-training step of a pretraining data pipeline, re-expressed
  * Spark-first the way the reference algorithm actually scales:
  *
  *  - ONE corpus pass builds the word-frequency dictionary (`groupBy word`,
  *    O(distinct words) rows). This is the only data-sized work.
  *  - every merge step then runs on the VOCAB-sized relation: adjacent
  *    symbol-pair counts weighted by word frequency, top-1 by
  *    (count DESC, pair ASC) — a deterministic tie-break — and a
  *    boundary-safe `regexp_replace` applying the merge.
  *  - driver state is ONLY the learned merge table (the model, O(nMerges)),
  *    exactly the [[VectorSearch]] k-means pattern: collecting the model is
  *    the at-scale design, not a shortcut.
  *
  * Symbol sequences are space-joined (`"h e l l o"`); merges must match
  * WHOLE symbols only, so the merge pattern is `\b<pair>\b` — `"b c"` must
  * not match inside `"ab c"` (the `b` there is mid-symbol). Symbols here
  * are always `[a-z]+` (corpus letters, and merges only concatenate), which
  * the code asserts before splicing a pair into a regex; RE2 and Java
  * regex agree on `\b` over `[a-z ]` text, which is what keeps the DuckDB
  * oracle exact.
  */
object Bpe {

  /** Learn `nMerges` merges over whitespace-tokenized `textCol`; returns
    * the merge table `(step, pair, merged, cnt)` — `cnt` is the weighted
    * occurrence count that won the step. Stops early (fewer rows) if no
    * pair remains.
    *
    * `batchSize` is the SCALE control (classic batched BPE): each round
    * collects the top candidates once and applies up to `batchSize`
    * SYMBOL-DISJOINT merges in a single chained projection, so a 50k-merge
    * vocabulary costs ~50k/batchSize Spark jobs instead of 50k — the r8
    * verdict's production-vocab gap. Disjointness is what keeps the round
    * honest: if two pairs share no symbol, neither merge can create or
    * destroy occurrences of the other (a replacement yields a fresh
    * non-empty symbol between untouched neighbors), so every selected
    * pair's pre-round count equals the count it actually merges at.
    * `batchSize = 1` (the default) is EXACTLY the sequential greedy
    * (BpeSpec pins it against an independent in-memory fold); larger
    * batches differ from sequential only in that pairs CREATED mid-round
    * wait for the next round's counts — the standard batched-BPE trade.
    */
  /** `ckptEvery` (r20): rounds between lineage-truncating checkpoints of
    * the vocab relation. Each eager checkpoint is a driver action (a
    * whole Spark job) on a vocab-sized relation; between checkpoints the
    * plan merely accumulates one chained `regexp_replace` layer per
    * round, which Catalyst handles fine for a handful of layers — it was
    * UNBOUNDED growth (hundreds of layers) that OOM'd, not nesting per
    * se. Checkpointing every 8th round keeps plan depth ≤ 8 while
    * cutting the per-merge job count roughly in half at small merge
    * counts (q118/q119's 5 merges now pay ZERO mid-loop checkpoints).
    * Results are identical at any cadence — it is pure plan shape.
    */
  val CkptEvery: Int = 8

  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int,
                  batchSize: Int = 1): DataFrame = {
    require(batchSize >= 1, s"batchSize=$batchSize")
    val spark = docs.sparkSession
    // the one corpus-sized pass: word frequencies, then char-spaced seqs.
    // localCheckpoint, not cache: each round re-derives `cur` from the
    // previous round's relation, so a cached lineage GROWS by a round's
    // worth of plan every iteration — at production merge counts the
    // accumulated logical plan alone OOMs the driver (measured: 1000
    // merges at sf0.1 died in explainString). Checkpointing truncates the
    // plan to an RDD scan each round, keeping plan size O(1) in rounds —
    // the [[GraphOps]] iteration discipline.
    var base = docs
      .select(explode(split(col(textCol), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seq"), col("n"))
      .localCheckpoint(true) // vocab-sized at any corpus scale
    var cur = base
    var roundsSinceCkpt = 0
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var exhausted = false
    while (merges.size < nMerges && !exhausted) {
      val want = math.min(batchSize, nMerges - merges.size)
      // over-fetch so symbol-sharing candidates can be skipped; the head
      // candidate is always selectable, so every round makes progress
      val top = cur
        .select(split(col("seq"), " ").as("a"), col("n"))
        .select(explode(arrays_zip(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1))).as("pr"), col("n"))
        .select(concat_ws(" ", col("pr.0"), col("pr.1")).as("pair"), col("n"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(math.max(want * 4, 32))
        .collect() // the model update: O(batch) rows per round
      if (top.isEmpty) exhausted = true
      else {
        val used = scala.collection.mutable.Set.empty[String]
        val picked = ArrayBuffer.empty[(String, Long)]
        top.iterator
          .map(r => (r.getString(0), r.getLong(1)))
          .foreach { case (pair, cnt) =>
            val syms = pair.split(" ")
            if (picked.size < want && syms.forall(!used(_))) {
              require(pair.matches("[a-z]+ [a-z]+"),
                s"BPE pair '$pair' is not two [a-z]+ symbols — the \\b merge " +
                  "pattern is only whole-symbol-safe over letter symbols")
              picked += ((pair, cnt))
              used ++= syms
            }
          }
        // the whole round is ONE projection over the vocab-sized relation:
        // chained \b-guarded replaces (order-independent by disjointness)
        val seqCol = picked.foldLeft(col("seq")) { case (c, (pair, _)) =>
          regexp_replace(c, "\\b" + pair + "\\b", pair.replace(" ", ""))
        }
        cur = cur.select(seqCol.as("seq"), col("n"))
        roundsSinceCkpt += 1
        // truncate lineage only every CkptEvery rounds (see its note) —
        // between truncations `cur` is a plain projection chain over the
        // last checkpoint, so each round costs only its top-k collect job
        if (roundsSinceCkpt >= CkptEvery) {
          val newBase = cur.localCheckpoint(true)
          unpersistLocalCheckpoint(base) // superseded ancestor's blocks drop
          base = newBase
          cur = newBase
          roundsSinceCkpt = 0
        }
        picked.foreach { case (pair, cnt) =>
          merges += ((merges.size + 1, pair, pair.replace(" ", ""), cnt))
        }
      }
    }
    unpersistLocalCheckpoint(base)
    import spark.implicits._
    merges.toSeq.toDF("step", "pair", "merged", "cnt").orderBy("step")
  }

  private def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }

  /** Apply a learned merge list to the corpus: per-document whitespace
    * token count, post-BPE symbol count, and symbols-per-word. The merge
    * list is the O(nMerges) model — collected once and folded into a
    * chain of `\b`-guarded `regexp_replace` column expressions, so the
    * application is a pure per-row codegen projection over the corpus
    * scan (ONE pass, no join, no shuffle before the per-doc aggregation):
    * tokenizing 100 TB costs the scan plus a doc-keyed partial+final agg.
    * Words ride with their doc_id, so merges can never cross a word
    * boundary and no separator symbol is needed.
    */
  def tokenStats(docs: DataFrame, idCol: String, textCol: String,
      merges: Seq[(String, String)]): DataFrame = {
    merges.foreach { case (pair, _) =>
      require(pair.matches("[a-z]+ [a-z]+"),
        s"BPE pair '$pair' is not two [a-z]+ symbols")
    }
    val spaced = trim(regexp_replace(col("w"), "(.)", "$1 "))
    val seq = merges.foldLeft(spaced) { case (c, (pair, merged)) =>
      regexp_replace(c, "\\b" + pair + "\\b", merged)
    }
    docs
      .select(col(idCol), explode(split(col(textCol), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .select(col(idCol), size(split(seq, " ")).as("n_sym"))
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_ws"),
        sum(col("n_sym")).as("n_bpe"),
        round(sum(col("n_sym")).cast("double") / count(lit(1)), 6)
          .as("symbols_per_word"))
      .orderBy(idCol)
  }
}
