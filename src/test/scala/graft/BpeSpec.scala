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

  // independent in-memory sequential BPE: overlapping pair counts (the
  // arrays_zip form), (cnt DESC, pair ASC) selection, left-to-right
  // non-overlapping merge application (the regexp_replace form)
  private def refSequential(words: Seq[(String, Long)], n: Int): Seq[(Int, String, String, Long)] = {
    def applyMerge(syms: Vector[String], l: String, r: String): Vector[String] = {
      val b = Vector.newBuilder[String]
      var i = 0
      while (i < syms.length) {
        if (i + 1 < syms.length && syms(i) == l && syms(i + 1) == r) { b += (l + r); i += 2 }
        else { b += syms(i); i += 1 }
      }
      b.result()
    }
    var seqs = words.map { case (w, c) => (w.map(_.toString).toVector, c) }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var step = 1
    var done = false
    while (step <= n && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long].withDefaultValue(0L)
      seqs.foreach { case (syms, c) =>
        var i = 0
        while (i + 1 < syms.length) { counts((syms(i), syms(i + 1))) += c; i += 1 }
      }
      if (counts.isEmpty) done = true
      else {
        val ((l, r), cnt) = counts.toSeq.sortBy { case ((a, b), c) => (-c, a + " " + b) }.head
        seqs = seqs.map { case (syms, c) => (applyMerge(syms, l, r), c) }
        out += ((step, s"$l $r", l + r, cnt))
        step += 1
      }
    }
    out.toSeq
  }

  test("batchSize=1 equals an independent in-memory sequential BPE on the real corpus") {
    import spark.implicits._
    val docs = Tables.documents(spark, sf0001)
    val words = docs.select(explode(split(col("text"), " +")).as("w"))
      .filter(length(col("w")) > 0)
      .groupBy("w").count().collect().map(r => r.getString(0) -> r.getLong(1)).toSeq
    val expected = refSequential(words, 6)
    val got = Bpe.learnMerges(docs, "text", 6).collect()
      .map(r => (r.getInt(0), r.getString(1), r.getString(2), r.getLong(3))).toSeq
    assert(got === expected)
  }

  test("batched rounds take only symbol-disjoint merges; disjoint tops match sequential") {
    import spark.implicits._
    // conflict corpus (the tie-break spec's): step-1 tops "a b"/"b a" share
    // symbols, so a B=2 round may only take "a b" — batching must yield
    // exactly the sequential table, one effective merge per round
    val conflict = (Seq.fill(10)("bab") ++ Seq.fill(2)("baab")).toDF("text")
    val seq2 = Bpe.learnMerges(conflict, "text", 2).collect().map(_.toSeq).toSeq
    val bat2 = Bpe.learnMerges(conflict, "text", 2, batchSize = 2).collect().map(_.toSeq).toSeq
    assert(bat2 === seq2)

    // disjoint corpus: "a b" (×10) and "c d" (×8) share no symbol, so ONE
    // batched round equals two sequential steps exactly — counts included
    // (disjointness keeps each pair's count invariant under the other)
    val disjoint = (Seq.fill(10)("ab") ++ Seq.fill(8)("cd")).toDF("text")
    val seqD = Bpe.learnMerges(disjoint, "text", 2).collect().map(_.toSeq).toSeq
    val batD = Bpe.learnMerges(disjoint, "text", 2, batchSize = 2).collect().map(_.toSeq).toSeq
    assert(batD === seqD)
    assert(batD.map(_(1)) === Seq("a b", "c d"))

    // batched learning at production-ish width still terminates early on
    // an exhausted corpus and never repeats a pair
    val m = Bpe.learnMerges(Tables.documents(spark, sf0001), "text", 40, batchSize = 8)
      .collect().map(r => (r.getInt(0), r.getString(1)))
    assert(m.map(_._2).distinct.length === m.length, "a pair was merged twice")
    assert(m.map(_._1).toSeq === (1 to m.length), "step numbering must be dense")
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
