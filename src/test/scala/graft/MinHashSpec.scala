package graft

import org.apache.spark.sql.functions._
import graft.ops.{MinHash, SimilarityJoin}

/** q43 has no SQL oracle (engine hash functions differ), so its contract is
  * pinned here against the exact join's ground truth with fixed seeds:
  * recall of true high-similarity pairs and bounded estimate error — the
  * standard MinHash guarantees (Broder 1997; MMDS ch. 3 banding S-curve).
  */
class MinHashSpec extends SparkSpec {

  private def exactPairs(tau: Double): Map[(Long, Long), Double] =
    SimilarityJoin.jaccardSelf(
      Tables.documents(spark, sf0001), "doc_id", "text", Seq("lang", "source"), tau)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  private lazy val lsh: Map[(Long, Long), Double] =
    MinHash.lshPairs(
      Tables.documents(spark, sf0001), "doc_id", "text", Seq("lang", "source"), 0.0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap

  test("LSH recall of true J>=0.8 pairs is >= 0.95 (expected ~0.985 at b=8,r=4)") {
    val truth = exactPairs(0.8)
    val found = truth.keySet.count(lsh.contains)
    assert(truth.nonEmpty)
    assert(found.toDouble / truth.size >= 0.95,
      s"recall ${found.toDouble / truth.size} over ${truth.size} true pairs")
  }

  test("MinHash estimate error is bounded: mean |est-true| <= 0.08, max <= 0.25") {
    // 32 hashes => stderr of a single estimate ~ sqrt(J(1-J)/32) ~ 0.07
    val truth = exactPairs(0.7)
    val errs = truth.flatMap { case (k, j) => lsh.get(k).map(e => math.abs(e - j)) }
    assert(errs.nonEmpty)
    assert(errs.sum / errs.size <= 0.08, s"mean err ${errs.sum / errs.size}")
    assert(errs.max <= 0.25, s"max err ${errs.max}")
  }

  test("group signatures sketch the union set: est slice-Jaccard tracks exact") {
    val docs = Tables.documents(spark, sf0001)
    // exact union-token-set Jaccard per lang pair (slices are few — the
    // reference computation collects)
    val byLang = docs.select("lang", "text").collect()
      .groupBy(_.getString(0))
      .map { case (l, rs) =>
        l -> rs.flatMap(_.getString(1).split(" +")).toSet
      }
    val langs = byLang.keys.toSeq.sorted
    val exact = (for {
      a <- langs; b <- langs if a < b
      inter = (byLang(a) intersect byLang(b)).size
    } yield (a, b) ->
      inter.toDouble / (byLang(a).size + byLang(b).size - inter)).toMap
    val est = MinHash.groupSimilarity(docs, Seq("lang"), "text")
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getDouble(2)).toMap
    assert(est.keySet === exact.keySet)
    // 32 hashes → stderr ≈ sqrt(J(1−J)/32) ≤ 0.09; allow 3σ
    exact.foreach { case (k, j) =>
      assert(math.abs(est(k) - j) <= 0.27, s"$k: est ${est(k)} vs exact $j")
    }
    // element-wise-min property: each group sig is the min of its docs' sigs
    val docSigs = MinHash.signatures(docs, "doc_id", "text", keep = Seq("lang"))
      .collect().map(r => r.getString(1) -> r.getSeq[Long](2))
    val groupSigs = MinHash.groupSignatures(docs, Seq("lang"), "text")
      .collect().map(r => r.getString(0) -> r.getSeq[Long](1)).toMap
    docSigs.groupBy(_._1).foreach { case (lang, rs) =>
      val expectedSig = rs.map(_._2).reduce((x, y) => x.zip(y).map(t => math.min(t._1, t._2)))
      assert(groupSigs(lang) === expectedSig, s"lang $lang")
    }
  }

  test("q73: slice-overlap matrix is one ordered row per unordered lang pair, run-stable") {
    val out1 = SparkEntry.queries("q73_source_overlap")(spark, sf0001).collect()
    assert(out1.length === 10, "5 langs -> 10 unordered pairs")
    assert(out1.forall(r => r.getString(0) < r.getString(1)))
    assert(out1.forall { r => val e = r.getDouble(2); e >= 0.0 && e <= 1.0 })
    val keys = out1.map(r => (r.getString(0), r.getString(1))).toSeq
    assert(keys === keys.sorted)
    val out2 = SparkEntry.queries("q73_source_overlap")(spark, sf0001).collect()
    assert(out1.map(_.toString).toSeq === out2.map(_.toString).toSeq)
  }

  test("signatures are deterministic: two plans give identical sigs") {
    val a = MinHash.signatures(Tables.documents(spark, sf0001), "doc_id", "text")
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = MinHash.signatures(Tables.documents(spark, sf0001), "doc_id", "text")
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }
}
