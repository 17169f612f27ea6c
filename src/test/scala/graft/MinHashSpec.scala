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

  test("signatures are deterministic: two plans give identical sigs") {
    val a = MinHash.signatures(Tables.documents(spark, sf0001), "doc_id", "text")
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val b = MinHash.signatures(Tables.documents(spark, sf0001), "doc_id", "text")
      .select("id", "sig").collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(a === b)
  }
}
