package graft

import org.apache.spark.sql.functions._
import graft.ops.Bpe

class BpeSpec extends SparkSpec {

  test("bpe merges match the hand-computed table, including the tie-break") {
    import spark.implicits._
    // "bab"×10 + "baab"×2:
    //   step 1 pairs: "a b" = 10+2 = 12, "b a" = 10+2 = 12, "a a" = 2
    //     → TIE at 12, pair-ASC tie-break picks "a b"
    //     "b a b" → "b ab";  "b a a b" → "b a ab"
    //   step 2 pairs: "b ab" = 10, "b a" = 2, "a ab" = 2 → "b ab" wins
    val docs = (Seq.fill(10)("bab") ++ Seq.fill(2)("baab"))
      .toDF("text")
    val m = Bpe.learnMerges(docs, "text", 2).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3)))
    assert(m.toSeq === Seq((1, "a b", "ab", 12L), (2, "b ab", "bab", 10L)))
  }

  test("the \\b merge guard fuses whole symbols only (naive substring replace would corrupt)") {
    // seq "ba ab" holds symbols [ba, ab]; pair "a ab" occurs as a SUBSTRING
    // (inside "ba" + the following symbol) but not as adjacent symbols —
    // the \b-guarded pattern Bpe splices must leave it untouched where a
    // plain substring replace would corrupt the "ba" symbol
    assert("ba ab".replace("a ab", "aab") === "baab") // the failure mode
    assert("ba ab".replaceAll("\\ba ab\\b", "aab") === "ba ab") // the guard
    // and the guard still merges genuinely adjacent repeats left-to-right
    assert("a b a b".replaceAll("\\ba b\\b", "ab") === "ab ab")
  }

  test("q119 tokenization: each merge can only shrink, bounds hold per doc") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val merges = ops.Bpe.learnMerges(docs, "text", 5)
      .select("pair", "merged").collect()
      .map(r => (r.getString(0), r.getString(1))).toSeq
    val with5 = ops.Bpe.tokenStats(docs, "doc_id", "text", merges)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val with0 = ops.Bpe.tokenStats(docs, "doc_id", "text", Nil)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val chars = docs.select(col("doc_id"),
      length(regexp_replace(col("text"), " +", ""))).collect()
      .map(r => r.getLong(0) -> r.getInt(1).toLong).toMap
    with5.foreach { case (id, (nWs, nBpe)) =>
      // un-merged symbol count == non-space chars; merges strictly shrink
      // or hold, and can never go below one symbol per word
      assert(with0(id) === chars(id), s"doc $id")
      assert(nBpe <= with0(id), s"doc $id: merges must not grow the count")
      assert(nBpe >= nWs, s"doc $id: at least one symbol per word")
    }
    // 5 merges over this corpus must actually compress somewhere
    assert(with5.exists { case (id, (_, nBpe)) => nBpe < with0(id) })
  }

  test("q118 is deterministic and stops early on an exhausted corpus") {
    import spark.implicits._
    val r1 = SparkEntry.queries("q118_bpe_merges")(spark, sf0001).collect()
    val r2 = SparkEntry.queries("q118_bpe_merges")(spark, sf0001).collect()
    assert(r1.length === 5)
    assert(r1.toSeq === r2.toSeq)
    // single-char words have no pairs: learning must stop with zero rows,
    // not loop or throw
    val tiny = Seq("a b a", "b a b").toDF("text")
    // every word is one char => no adjacent symbol pairs at any step
    assert(Bpe.learnMerges(tiny, "text", 3).count() === 0L)
  }
}
