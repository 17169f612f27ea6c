package graft

import org.apache.spark.sql.functions._
import graft.ops.GraphOps

class GraphOpsSpec extends SparkSpec {

  test("connected components: handcrafted graph resolves to per-component min labels") {
    import spark.implicits._
    // components: {1,2,3,4} (a triangle plus a pendant), {10,11}, and a
    // 2-hop chain {20,21,22} where (20,22) is never an edge
    val edges = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (10L, 11L), (20L, 21L), (21L, 22L)).toDF("a_id", "b_id")
    val out = GraphOps.connectedComponents(edges, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L, 21L -> 20L, 22L -> 20L))
  }

  test("long chain converges (diameter-bound rounds) and over-cap fails loudly without fallback") {
    import spark.implicits._
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = GraphOps.connectedComponents(chain, "a_id", "b_id", maxIter = 40)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length === 30 && out.forall(_._2 === 0L))
    // with the fallback disabled, a 30-node path (diameter 29) past a
    // 5-round cap must refuse rather than return a partial labeling
    val ex = intercept[IllegalArgumentException] {
      GraphOps.connectedComponents(chain, "a_id", "b_id", maxIter = 5,
        fallback = false).collect()
    }
    assert(ex.getMessage.contains("converge"))
  }

  test("over-cap diameter dispatches to alternating-star and still labels correctly (r8)") {
    import spark.implicits._
    // diameter 29 >> the 5-round propagation cap: the default path now
    // hands the materialized edges to large-star/small-star instead of
    // failing — same labels as the converged propagation
    val chain = (0L until 29L).map(i => (i, i + 1)).toDF("a_id", "b_id")
    val out = GraphOps.connectedComponents(chain, "a_id", "b_id", maxIter = 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    assert(out.length === 30 && out.forall(_._2 === 0L))
  }

  test("alternating-star equals min-label propagation on a mixed-shape graph (r8)") {
    import spark.implicits._
    // triangle + pendant, 2-pair component, 3-chain, and a 60-node path
    // (deep) sharing one edge list — the shapes exercise both the star
    // re-hang and the multi-component bookkeeping
    val edges = (Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
      (10L, 11L), (20L, 21L), (21L, 22L)) ++
      (100L until 159L).map(i => (i, i + 1))).toDF("a_id", "b_id")
    val alt = GraphOps.connectedComponentsAlternating(edges, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val prop = GraphOps.connectedComponents(edges, "a_id", "b_id", maxIter = 80,
        fallback = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(alt === prop)
    assert((100L to 159L).forall(n => alt(n) === 100L))
  }

  test("triangle counts: K4 vs star, orientation- and duplicate-proof (r8)") {
    import spark.implicits._
    import graft.ops.GraphOps
    // K4 on {1,2,3,4}: 4 triangles, every node in C(3,2) = 3 of them;
    // a star hub 10 with leaves {11,12,13}: zero triangles anywhere
    val k4 = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val star = Seq((10L, 11L), (10L, 12L), (10L, 13L))
    val out = GraphOps.triangleCounts((k4 ++ star).toDF("a_id", "b_id"), "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L),
      s"hub nodes must not appear; got $out")
    // reversed and duplicated edges must change nothing (canonicalized)
    val messy = (k4 ++ k4.map(_.swap) ++ star).toDF("a_id", "b_id")
    val out2 = GraphOps.triangleCounts(messy, "a_id", "b_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(out2 === out)
  }

  test("q71: cluster ids are component minima consistent with the q36 pair graph") {
    val pairs = SparkEntry.queries("q36_jaccard_self_join")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    val clusters = SparkEntry.queries("q71_dedup_clusters")(spark, sf0001)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(clusters.nonEmpty)
    // every pair endpoint is labeled, both endpoints agree, label <= id
    pairs.foreach { case (a, b) =>
      assert(clusters(a) === clusters(b), s"pair ($a,$b) split across clusters")
      assert(clusters(a) <= a)
    }
    // every cluster id is itself a member labeled with itself (the root)
    clusters.values.toSet.foreach { c: Long => assert(clusters(c) === c) }
    // membership is exactly the pair-graph node set
    assert(clusters.keySet === pairs.flatMap(p => Seq(p._1, p._2)).toSet)
  }

  test("pagerank: mass conserved, hub outranks leaves, orientation-proof (r8)") {
    import spark.implicits._
    // star: 1 is the hub of 2..5, plus a detached pair 10-11; mixed edge
    // orientations and a duplicate edge must not change anything
    val edges = Seq((1L, 2L), (3L, 1L), (1L, 4L), (5L, 1L), (1L, 2L),
      (10L, 11L)).toDF("a", "b")
    val r = graft.ops.GraphOps.pageRank(edges, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r.keySet === Set(1L, 2L, 3L, 4L, 5L, 10L, 11L))
    // total rank mass is conserved (no dangling nodes after symmetrizing)
    assert(math.abs(r.values.sum - 1.0) < 1e-9, r.values.sum)
    // the hub strictly outranks every leaf; detached-pair nodes tie
    for (leaf <- Seq(2L, 3L, 4L, 5L)) assert(r(1L) > r(leaf), s"leaf $leaf")
    assert(math.abs(r(10L) - r(11L)) < 1e-15)
    // deterministic across runs (exact decimal contribution sums)
    val r2 = graft.ops.GraphOps.pageRank(edges, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(r === r2)
  }

  test("r20: canonical-edge fast paths equal the defaults on canonical input") {
    import spark.implicits._
    // DISTINCT, low<high oriented — the similarity-pair shape the flags
    // assert; the fast paths must be bit-identical to the safe defaults
    val canon = (Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L),
      (10L, 11L)) ++ (20L until 24L).map(i => (i, i + 1))).toDF("a", "b")
    val triFast = GraphOps.triangleCounts(canon, "a", "b", assumeCanonical = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val triSafe = GraphOps.triangleCounts(canon, "a", "b")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(triFast === triSafe)
    val prFast = GraphOps.pageRank(canon, "a", "b", iters = 3, edgesCanonical = true)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    val prSafe = GraphOps.pageRank(canon, "a", "b", iters = 3)
      .collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    assert(prFast === prSafe)
  }

  test("pagerank: empty and self-loop-only edge lists yield empty ranks (r8)") {
    import spark.implicits._
    assert(graft.ops.GraphOps.pageRank(
      Seq.empty[(Long, Long)].toDF("a", "b"), "a", "b").count() === 0L)
    assert(graft.ops.GraphOps.pageRank(
      Seq((7L, 7L)).toDF("a", "b"), "a", "b").count() === 0L)
  }
}
