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
