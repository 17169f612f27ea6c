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
  *  - convergence is probed with a bounded `isEmpty` (limit-1 scan) on the
  *    changed-label set — a scalar per round, same protocol as every other
  *    bounded probe in this library.
  */
object GraphOps {

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
    */
  def connectedComponents(edges: DataFrame, srcCol: String, dstCol: String,
                          maxIter: Int = 20): DataFrame = {
    // materialize the (typically expensive) edge relation ONCE — without
    // this every round's join would recompute the upstream plan (for the
    // dedup use case, the whole similarity join) from the scan
    val und = edges.select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .union(edges.select(col(dstCol).cast("long").as("u"), col(srcCol).cast("long").as("v")))
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
      // the convergence check rides on the SAME materialized round result
      // (old label carried as a column) — no second join, no extra shuffle
      val prev = labels
      val next = labels.join(nbrMin, Seq("u"), "left")
        .select(col("u"), col("lbl").as("old"),
          least(col("lbl"), coalesce(col("nlbl"), col("lbl"))).as("lbl"))
        .localCheckpoint(true)
      converged = next.filter(col("lbl") =!= col("old")).isEmpty
      labels = next.select("u", "lbl")
      // `next` is eagerly materialized above, so round i−1's checkpoint
      // blocks can be dropped now (only the newest label relation — and
      // `und` — stay cached; the last one is the caller's result)
      unpersistLocalCheckpoint(prev)
      i += 1
    }
    require(converged, s"connectedComponents did not converge in $maxIter rounds " +
      "— component diameter exceeds the cap; raise maxIter")
    labels.select(col("u").as(srcCol), col("lbl").as("cluster_id"))
      .orderBy(srcCol)
  }
}
