package graft

import org.apache.spark.sql.functions._
import graft.ops.SimilarityJoin

class SimilarityJoinSpec extends SparkSpec {

  test("q36: 342 pairs at sf0.001, tau=0.8, (lang,source) blocking") {
    val out = SparkEntry.queries("q36_jaccard_self_join")(spark, sf0001).collect()
    assert(out.length === 342)
    // schema + order invariants
    assert(out.head.schema.fieldNames.toSeq === Seq("a_id", "b_id", "sim"))
    val keys = out.map(r => (r.getLong(0), r.getLong(1)))
    assert(keys.toSeq === keys.toSeq.sorted)
    // all sims within [0.8, 1]
    assert(out.forall { r => val s = r.getDouble(2); s >= 0.8 - 1e-9 && s <= 1.0 + 1e-9 })
    // a < b always
    assert(out.forall(r => r.getLong(0) < r.getLong(1)))
  }

  test("jaccard thresholds match measured ground truth (FIXTURES.md)") {
    val docs = Tables.documents(spark, sf0001)
    val at07 = SimilarityJoin.jaccardSelf(docs, "doc_id", "text", Seq("lang", "source"), 0.7).count()
    val at09 = SimilarityJoin.jaccardSelf(docs, "doc_id", "text", Seq("lang", "source"), 0.9).count()
    assert(at07 === 609L)
    assert(at09 === 125L)
  }

  test("prefix-filtered variant ≡ exact variant (no false negatives/positives)") {
    val docs = Tables.documents(spark, sf0001)
    val exact = SimilarityJoin.jaccardSelf(docs, "doc_id", "text", Seq("lang", "source"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val pref = SimilarityJoin.jaccardSelfPrefix(docs, "doc_id", "text", Seq("lang", "source"), 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(pref === exact)
  }

  test("prefix path: vocabulary-size dispatch — shuffle join ≡ broadcast join") {
    val sets = SimilarityJoin.tokenized(Tables.documents(spark, sf0001), "text")
    val bcPairs = SimilarityJoin.jaccardSelfPrefixOnSets(
        sets, "doc_id", "tokens", Seq("lang", "source"), 0.8, Some(true))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    val shPairs = SimilarityJoin.jaccardSelfPrefixOnSets(
        sets, "doc_id", "tokens", Seq("lang", "source"), 0.8, Some(false))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSet
    assert(shPairs === bcPairs)
    assert(bcPairs.nonEmpty)
  }

  test("self-similarity sanity: doc joined with its own copy gives sim 1.0") {
    val docs = Tables.documents(spark, sf0001).limit(20)
    val shifted = docs.withColumn("doc_id", col("doc_id") + lit(1000000L))
    val both = docs.unionByName(shifted)
    val pairs = SimilarityJoin.jaccardSelf(both, "doc_id", "text", Seq("lang", "source"), 0.999)
      .filter(col("b_id") === col("a_id") + lit(1000000L))
    assert(pairs.count() === 20L)
    assert(pairs.collect().forall(_.getDouble(2) === 1.0))
  }
}
