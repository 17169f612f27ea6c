package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components over an undirected edge list — the dedup-CLUSTER
  * primitive: near-dup similarity pairs are edges, and keep-one-per-cluster
  * dedup needs the transitive closure (a chain a–b–c is ONE duplicate
  * group even though (a, c) was never emitted as a pair).
  *
  * Algorithm: iterative min-label propagation. Every node starts labeled
  * with its own id; each round takes the min of its own and its neighbors'
  * labels; convergence in O(component diameter) rounds. Dedup clusters are
  * shallow (near-dup graphs are dense cliques-of-cliques, diameter is
  * almost always < 10), so the simple propagation beats the
  * alternating-star optimizations (Kiveris et al., "Connected Components
  * in MapReduce and Beyond", SoCC 2014) in round count for this workload
  * while staying two shuffles per round (join + min-agg).
  *
  * Scale notes:
  *  - each round is an equi-join of the edge list against the label
  *    relation plus a partial+final min aggregation — no driver data path.
  *  - `localCheckpoint` truncates plan lineage per round; without it the
  *    logical plan doubles every iteration and Catalyst re-analysis, not
  *    the shuffle, becomes the bottleneck (the standard iterative-DataFrame
  *    pattern).
  *  - convergence is an OBSERVED metric (changed-label count) collected
  *    by each round's own materializing checkpoint action (r20) — one
  *    driver action per round, no follow-up probe job.
  */
object GraphOps {

  /** Process-wide observation-name uniquifier — see the note at the use
    * site (observed metrics are delivered by name).
    */
  private val ObsId = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Free the block-manager storage behind a `localCheckpoint(true)`-backed
    * relation once the NEXT round is materialized — without this every
    * round's label relation stays cached and storage grows linearly with
    * rounds (up to maxIter copies). Safe only because nothing references
    * the previous round after its successor is eagerly checkpointed (a
    * local checkpoint is unrecomputable once unpersisted).
    */
  private def unpersistLocalCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => ()
    }

  /** Label each node of the undirected graph `edges` with the MINIMUM node
    * id reachable from it. Output: (`srcCol` → node id, `cluster_id`), one
    * row per distinct endpoint, totally ordered by node id.
    *
    * Dispatch: min-label propagation (O(diameter) rounds — optimal for the
    * dense clique-shaped clusters near-dup graphs produce) with, when the
    * diameter exceeds `maxIter`, an automatic hand-off of the ALREADY
    * MATERIALIZED edge relation to [[connectedComponentsAlternating]]
    * (O(log n) rounds on any shape) — so a pathological path-shaped
    * component degrades to the alternating-star algorithm instead of
    * failing. `fallback = false` restores the loud `require` for callers
    * that would rather fail than absorb the extra rounds.
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20, fallback: Boolean = true): DataFrame = {
    // materialize the (typically expensive) edge relation ONCE — without
    // this every round's join would recompute the upstream plan (for the
    // dedup use case, the whole similarity join) from the scan.
    // r20: the symmetrization is a per-row EXPLODE of both orientations,
    // not a self-union — a union references the upstream plan twice (the
    // r9 fix checkpointed the directed edges first to avoid executing the
    // pair join twice, at the cost of a second checkpoint job + a second
    // materialization pass); the explode reads the upstream exactly once
    // and lands the symmetrized relation in ONE checkpoint. Same rows.
    // (r20 note: an explicit repartition(shuffleWidth, v) + local sort of
    // this checkpoint was also tried, to pre-align the loop joins — it
    // REGRESSED ~1 s/query at sf0.1: the label relation is broadcast in
    // the loop, so no und-side shuffle existed to save, while pinning the
    // checkpoint to the full shuffle width turned every round's 1–2-task
    // jobs into 32-task jobs. AQE's coalescing already sizes these
    // relations; keep the checkpoint at its natural partitioning.)
    val und = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .select(explode(array(
        struct(col("u"), col("v")),
        struct(col("v").as("u"), col("u").as("v")))).as("e"))
      .select(col("e.u").as("u"), col("e.v").as("v"))
      .localCheckpoint(true)
    // seed with the 1-HOP minimum (min over self and direct neighbors) —
    // one aggregation on the already-materialized edge list, no join: the
    // first propagation round comes free, and a diameter-1 clique (the
    // dominant dedup-cluster shape) then converges in a single loop round
    var labels = und.groupBy("u")
      .agg(least(col("u"), min(col("v"))).as("lbl")).localCheckpoint(true)
    var converged = false
    var i = 0
    while (!converged && i < maxIter) {
      val nbrMin = und.join(labels.select(col("u").as("v"), col("lbl").as("vlbl")), "v")
        .groupBy("u").agg(min(col("vlbl")).as("nlbl"))
      // r20: the convergence check is an OBSERVED metric on the round's own
      // materializing action — the changed-label count is collected by the
      // checkpoint job itself (Dataset.observe riding localCheckpoint),
      // replacing the per-round follow-up `isEmpty` job. One driver action
      // per round instead of two; the metric is exact (count over every
      // row the checkpoint writes), not a sample.
      val prev = labels
      // a fresh name per observation, process-wide: Spark delivers observed
      // metrics to listeners BY NAME, so two concurrent connectedComponents
      // calls in one session (e.g. parallel test suites) sharing a
      // "cc_round_0" name could read each other's changed-count
      val obs = org.apache.spark.sql.Observation(
        s"cc_round_${i}_${ObsId.incrementAndGet()}")
      val next = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .observe(obs, count(when(col("lbl") =!= col("old"), 1)).as("changed"))
        .localCheckpoint(true)
      converged = obs.get("changed").asInstanceOf[Long] == 0L
      labels = next.select("u", "lbl")
      // `next` is eagerly materialized above, so round i−1's checkpoint
      // blocks can be dropped now (only the newest label relation — and
      // `und` — stay cached; the last one is the caller's result)
      unpersistLocalCheckpoint(prev)
      i += 1
    }
    if (!converged && fallback) {
      // the propagation cap is a DIAMETER bound, not an error, when the
      // alternating-star path is available: re-dispatch the materialized
      // edge relation (und is checkpointed — the expensive upstream plan,
      // e.g. the whole similarity join, is NOT recomputed)
      unpersistLocalCheckpoint(labels)
      val out = connectedComponentsAlternating(und, "u", "v")
        .withColumnRenamed("u", srcCol)
      // the callee eagerly checkpointed its own canonical edge relation,
      // so und's blocks are droppable the moment it returns
      unpersistLocalCheckpoint(und)
      return out
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— component diameter exceeds the cap; raise maxIter or enable fallback")
    // the result depends only on the FINAL label checkpoint (released by
    // the ContextCleaner when the caller drops the result); the edge
    // relation served its last consumer in the loop above
    unpersistLocalCheckpoint(und)
    labels.select(col("u").as(srcCol), col("lbl").as("cluster_id"))
      .orderBy(srcCol)
  }

  /** Connected components via alternating large-star / small-star rounds
    * (Kiveris et al., "Connected Components in MapReduce and Beyond",
    * SoCC 2014): each round hangs every node off the minimum of its
    * neighborhood, halving tree heights — convergence in O(log n) rounds
    * on ANY graph shape, where min-label propagation needs O(diameter).
    * The per-round cost (two neighborhood aggregations + joins on the
    * shrinking edge relation) is higher than propagation's, which is why
    * this is the FALLBACK for deep graphs, not the default for the
    * clique-shaped near-dup clusters dedup produces.
    *
    * large-star: for each node u with m = min(Γ(u) ∪ {u}), re-hang every
    * LARGER neighbor onto m. small-star: with m = min over the SMALLER
    * neighborhood only, re-hang the smaller neighbors and u itself onto
    * m. A fixed point is reached exactly when every component is a star
    * rooted at its minimum, read out as (child → root).
    */
  def connectedComponentsAlternating(edges: DataFrame, srcCol: String,
                                     dstCol: String,
                                     maxRounds: Int = 60): DataFrame = {
    def canon(df: DataFrame): DataFrame = df
      .filter(col("a") =!= col("b"))
      .select(least(col("a"), col("b")).as("u"), greatest(col("a"), col("b")).as("v"))
      .distinct()
    val e0 = canon(edges.select(col(srcCol).cast("long").as("a"),
        col(dstCol).cast("long").as("b")))
      .localCheckpoint(true)
    // the node universe is fixed by the INPUT edges; star rounds rewire
    // edges, so late rounds may not mention every node
    val nodes = e0.select(col("u").as("node"))
      .union(e0.select(col("v").as("node"))).distinct().localCheckpoint(true)
    var e = e0
    var converged = e.isEmpty
    var i = 0
    while (!converged && i < maxRounds) {
      // large-star
      val und = e.select(col("u"), col("v"))
        .union(e.select(col("v").as("u"), col("u").as("v")))
      val m = und.groupBy("u").agg(least(col("u"), min(col("v"))).as("m"))
      val ls = canon(und.join(m, "u").filter(col("v") > col("u"))
        .select(col("v").as("a"), col("m").as("b")))
      // small-star over the large-star result
      val lsUnd = ls.select(col("u"), col("v"))
        .union(ls.select(col("v").as("u"), col("u").as("v")))
      val smaller = lsUnd.filter(col("v") < col("u"))
      val m2 = smaller.groupBy("u").agg(min(col("v")).as("m"))
      val prev = e
      val next = canon(
          smaller.join(m2, "u").select(col("v").as("a"), col("m").as("b"))
            .union(m2.select(col("u").as("a"), col("m").as("b"))))
        .localCheckpoint(true)
      // fixed point: same distinct edge count and no edge outside the old
      // set (equal counts + one-sided emptiness ⇒ set equality)
      converged = next.count() == prev.count() && next.except(prev).isEmpty
      e = next
      if (prev ne e0) unpersistLocalCheckpoint(prev)
      i += 1
    }
    require(converged, s"alternating-star did not converge in $maxRounds rounds")
    // the result depends on `nodes` and the FINAL `e` (ContextCleaner-
    // released with the result); the seed edge checkpoint is dead unless
    // the loop never replaced it
    if (e ne e0) unpersistLocalCheckpoint(e0)
    // stars: every edge is (root, child); roots label themselves, and any
    // node the final edge set no longer mentions is its own root
    val labels = e.select(col("v").as("node"), col("u").as("cluster_id"))
      .union(e.select(col("u").as("node"), col("u").as("cluster_id")))
      .distinct()
    val out = nodes.join(labels, Seq("node"), "left")
      .select(col("node").as(srcCol),
        coalesce(col("cluster_id"), col("node")).as("cluster_id"))
      .orderBy(srcCol)
    out
  }

  /** Per-node TRIANGLE counts over an ORIENTED (src < dst) edge relation —
    * the cluster-cohesion signal for a near-dup graph: nodes in dense
    * triangles sit inside genuine duplicate cliques, nodes with many
    * edges but few triangles are hub-shaped false-positive suspects.
    *
    * The classic two-join enumeration with every edge oriented low→high:
    * each triangle x<y<z is produced exactly once as (x,y)+(y,z)+(x,z),
    * so no post-hoc dedup or /3 correction is needed. The edge relation
    * is `localCheckpoint`ed once — the (possibly expensive) upstream plan
    * that produced the edges is never recomputed across the three join
    * arms. Scale: both joins are equi-joins on node ids; the well-known
    * high-degree-node quadratic risk is bounded by orientation (a node's
    * join fan-out is its HIGHER-neighbor count, which for the
    * min-oriented form of a skewed graph is the standard mitigation) and
    * by dedup graphs being clique-shaped with bounded clique sizes.
    */
  /** `assumeCanonical = true` (r20): the caller asserts `edges` is already
    * DISTINCT and oriented src < dst per row (the similarity-pair shape),
    * so the canonicalizing least/greatest + `distinct()` shuffle is
    * skipped — identical output for such inputs.
    */
  def triangleCounts(edges: DataFrame, srcCol: String, dstCol: String,
                     assumeCanonical: Boolean = false): DataFrame = {
    val e0 = edges
      .select(col(srcCol).cast("long").as("a0"), col(dstCol).cast("long").as("b0"))
      .filter(col("a0") =!= col("b0"))
    val e = (if (assumeCanonical)
        e0.select(col("a0").as("a"), col("b0").as("b"))
      else e0
        // canonicalize rather than assume orientation: a reversed or
        // duplicated input edge must not silently drop (or double) a triangle
        .select(least(col("a0"), col("b0")).as("a"),
          greatest(col("a0"), col("b0")).as("b"))
        .distinct())
      .localCheckpoint(true)
    val tri = e.select(col("a").as("x"), col("b").as("y"))
      .join(e.select(col("a").as("y"), col("b").as("z")), "y")
      .join(e.select(col("a").as("x"), col("b").as("z")), Seq("x", "z"))
      .select("x", "y", "z")
    val out = tri
      .select(explode(array(col("x"), col("y"), col("z"))).as("node"))
      .groupBy("node").agg(count(lit(1)).as("n_triangles"))
      .select(col("node").as(srcCol), col("n_triangles"))
      .orderBy(srcCol)
    out
  }

  /** PageRank over an UNDIRECTED edge list (each edge contributes both
    * directions), fixed iteration count, damping 0.85 — centrality over
    * the near-dup graph: a high-rank node is the hub its duplicate
    * neighborhood points at, i.e. the natural canonical-document choice.
    * The node set is the edge endpoints (symmetrized edges mean every node
    * has out-degree ≥ 1 — no dangling-mass redistribution needed).
    *
    * Determinism at any parallelism: the per-node incoming sum is the ONE
    * order-sensitive reduction in the algorithm, so each contribution
    * `rank/degree` (an IEEE division — correctly rounded, bit-identical
    * on every engine) is cast to DECIMAL(38,18) before summing: the cast
    * is value-correct (round the double's exact binary value at 18 dp) on
    * both engines where a double `round()` can differ by an ulp, and the
    * decimal sum is associative in any shuffle order. The rest of the
    * update (`0.15/n + 0.85·sum`) is a fixed IEEE sequence. Same
    * exact-sum discipline as [[graft.Det]].
    *
    * Scale: each iteration is one equi-join (edges × ranks, shuffled on
    * the node key) plus a partial+final agg — the q71 connected-components
    * cost model; lineage is truncated per round and the previous round's
    * checkpoint is unpersisted. Fixed `iters` (no convergence probe):
    * rank consumers want a bounded-cost estimate, not a fixpoint.
    */
  /** `edgesCanonical = true` (r20): the caller asserts `edges` is already
    * DISTINCT with src < dst per row (exactly what the similarity-pair
    * relations emit — one row per unordered pair), so the symmetrizing
    * union cannot produce duplicates and the edge-relation-sized
    * `distinct()` shuffle is skipped. Results are identical for such
    * inputs; leave false for edge lists of unknown provenance.
    */
  def pageRank(edges: DataFrame, srcCol: String, dstCol: String,
               iters: Int = 3, damping: Double = 0.85,
               edgesCanonical: Boolean = false): DataFrame = {
    require(iters >= 1, s"iters $iters")
    // r20: symmetrize by EXPLODING both orientations per row instead of a
    // self-union — the union referenced the upstream plan twice, forcing a
    // separate directed-edge checkpoint first (the r9 fix); the explode
    // reads the upstream exactly once, so the whole symmetrized relation
    // lands in one checkpoint job. Same rows.
    val symRaw = edges
      .select(col(srcCol).cast("long").as("src"), col(dstCol).cast("long").as("dst"))
      .filter(col("src") =!= col("dst"))
      .select(explode(array(
        struct(col("src"), col("dst")),
        struct(col("dst").as("src"), col("src").as("dst")))).as("e"))
      .select(col("e.src").as("src"), col("e.dst").as("dst"))
    // canonical input ⇒ the symmetrizing explode is duplicate-free by
    // construction and the edge-relation-sized distinct() shuffle drops out
    val sym = (if (edgesCanonical) symRaw else symRaw.distinct())
      .localCheckpoint(true)
    val deg = sym.groupBy("src").agg(count(lit(1)).as("deg"))
      .localCheckpoint(true)
    // out-degree rides the edge list ONCE — joining deg inside the loop
    // would re-pay an edge-sized shuffle every iteration
    val symDeg = sym.join(deg, "src").localCheckpoint(true)
    unpersistLocalCheckpoint(sym)
    val n = deg.agg(count(lit(1)).cast("double").as("n"))
    // the seed ranks are a cheap projection of the (checkpointed) degree
    // relation — r20 drops their separate checkpoint job: iteration 1
    // simply computes them inline, and lineage cannot grow because every
    // iteration checkpoints its own result
    var ranks = deg.crossJoin(broadcast(n))
      .select(col("src").as("node"), (lit(1.0) / col("n")).as("r"))
    // the seed `ranks` is NOT a checkpoint (its plan rides deg's), so the
    // first iteration must not unpersist through it — deg would become
    // unrecomputable while `n` still reads it
    var ranksCheckpointed = false
    for (_ <- 1 to iters) {
      val next = symDeg
        .join(ranks, col("src") === col("node"))
        .select(col("dst"),
          (col("r") / col("deg")).cast("decimal(38,18)").as("contrib"))
        .groupBy("dst").agg(sum(col("contrib")).cast("double").as("in_sum"))
        .crossJoin(broadcast(n))
        .select(col("dst").as("node"),
          (lit(1.0 - damping) / col("n") + lit(damping) * col("in_sum")).as("r"))
        .localCheckpoint(true)
      if (ranksCheckpointed) unpersistLocalCheckpoint(ranks)
      ranks = next
      ranksCheckpointed = true
    }
    // every iteration's plan materialized eagerly above, so the degree
    // relations have no remaining consumer; the returned `ranks`
    // checkpoint is ContextCleaner-released when the caller drops it
    unpersistLocalCheckpoint(deg)
    unpersistLocalCheckpoint(symDeg)
    ranks
  }
}
