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
    */
  def learnMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    // the one corpus-sized pass: word frequencies, then char-spaced seqs
    var cur = docs
      .select(explode(split(col(textCol), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").agg(count(lit(1)).as("n"))
      .select(trim(regexp_replace(col("w"), "(.)", "$1 ")).as("seq"), col("n"))
      .cache() // vocab-sized at any corpus scale
    val merges = ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var exhausted = false
    while (step <= nMerges && !exhausted) {
      val top = cur
        .select(split(col("seq"), " ").as("a"), col("n"))
        .select(explode(arrays_zip(
          slice(col("a"), lit(1), size(col("a")) - 1),
          slice(col("a"), lit(2), size(col("a")) - 1))).as("pr"), col("n"))
        .select(concat_ws(" ", col("pr.0"), col("pr.1")).as("pair"), col("n"))
        .groupBy("pair").agg(sum(col("n")).as("cnt"))
        .orderBy(col("cnt").desc, col("pair"))
        .limit(1)
        .collect() // the model update: one (pair, cnt) row per step
      if (top.isEmpty) exhausted = true
      else {
        val pair = top(0).getString(0)
        val cnt = top(0).getLong(1)
        require(pair.matches("[a-z]+ [a-z]+"),
          s"BPE pair '$pair' is not two [a-z]+ symbols — the \\b merge " +
            "pattern is only whole-symbol-safe over letter symbols")
        val merged = pair.replace(" ", "")
        val prev = cur
        cur = prev
          .select(regexp_replace(col("seq"), "\\b" + pair + "\\b", merged)
            .as("seq"), col("n"))
          .cache()
        cur.count() // materialize before dropping the parent
        prev.unpersist(false)
        merges += ((step, pair, merged, cnt))
        step += 1
      }
    }
    cur.unpersist(false)
    import spark.implicits._
    merges.toSeq.toDF("step", "pair", "merged", "cnt").orderBy("step")
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
