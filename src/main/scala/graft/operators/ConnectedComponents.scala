package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed connected components by min-label propagation, the building
  * block under `dedup_clusters`: every vertex repeatedly takes the smallest
  * label in its closed neighborhood until a fixpoint.
  *
  * Scale shape: each round is ONE shuffle of the edge list (join on `src`)
  * plus one of the label table — the iterate-to-fixpoint pattern
  * GraphX/GraphFrames CC uses on clusters. Lineage is truncated per round
  * (`localCheckpoint`), so the plan stays flat regardless of round count.
  * Rounds needed = the graph's label-propagation radius: near-dup clusters
  * are dense (radius 1-2); long chains are the worst case, which is why
  * convergence is a hard `require` rather than a silent cap — wrong
  * cluster ids corrupt a dedup pipeline invisibly.
  *
  * @param vertices one column: the vertex id — any ORDERABLE type (longs,
  *                 strings, …): propagation uses only `min`/`least`, so
  *                 running CC directly over natural keys (e.g. the names
  *                 being linked) avoids hash node ids and their collision
  *                 risk, and the component label is the minimum natural
  *                 key reachable
  * @param edges    two columns: `src`, `dst` — ONE row per undirected edge
  *                 (symmetrization happens here)
  * @param maxIter  ceiling on PROPAGATION STEPS (graph-radius hops), not on
  *                 materialization rounds — each round runs two steps and
  *                 counts as two, so the contract is stable against the
  *                 internal batching factor; an odd ceiling rounds DOWN
  *                 (the loop never starts a round it can't finish inside
  *                 the budget). Default 50 = the 25 double-step rounds
  *                 this operator always allowed.
  * @return (id, component) where component = min vertex id reachable
  */
object ConnectedComponents {
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 50): DataFrame = {
    val idCol = vertices.columns.head
    val sym = edges
      .select(col(edges.columns(0)).as("src"), col(edges.columns(1)).as("dst"))
      .union(edges
        .select(col(edges.columns(1)).as("src"), col(edges.columns(0)).as("dst")))
      .localCheckpoint(true)
    // ckpt holds the checkpointed plan (releasable); labels is the 2-column
    // view of it the next round consumes
    var ckpt = vertices
      .select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint(true)
    var labels = ckpt
    var converged = false
    var iter = 0
    // One propagation step; `prev` (the component at round start) rides
    // through so convergence is a filter on the result itself — no second
    // full join of the label table per round.
    def step(l: DataFrame): DataFrame = {
      val nbrMin = sym
        .join(l, sym("src") === l("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("nbr_min"))
      l.join(nbrMin, l("id") === nbrMin("dst"), "left")
        .select(l("id"),
          least(l("component"), coalesce(col("nbr_min"), l("component")))
            .as("component"),
          l("prev"))
    }
    while (!converged && iter + 2 <= maxIter) {
      // TWO steps per materialization round: the checkpoint + convergence
      // action is the per-round fixed cost, and labels are MONOTONE
      // non-increasing under min-propagation. `prev` is re-stamped
      // BETWEEN the two steps (round 17), so the convergence filter
      // tests the SECOND step alone: one full step with no change IS a
      // fixpoint under monotone min-propagation, and testing the last
      // step (not the pair) detects it one materialized round earlier —
      // a radius-1 graph (the near-dup common case: dense cliques)
      // converges in ONE round instead of two, halving the CC fixed
      // cost its six query families pay per run.
      val next = step(
        step(labels.withColumn("prev", col("component")))
          .drop("prev").withColumn("prev", col("component")))
        .localCheckpoint(true)
      converged = next.filter(col("component") =!= col("prev")).isEmpty
      release(ckpt)
      ckpt = next
      labels = next.select("id", "component")
      iter += 2 // two propagation steps ran, so two against the ceiling
    }
    require(converged,
      s"ConnectedComponents: not converged after $iter propagation steps" +
        s" (maxIter=$maxIter)")
    // The FINAL round's checkpoint backs the returned labels, so it
    // cannot be released here — register it so the host can free it once
    // the consuming action has run (round 18: previously it leaked one
    // label-table copy per run for the JVM's lifetime).
    graft.util.Staged.track(ckpt)
    val out = labels
    release(sym)
    out
  }

  /** Free a superseded localCheckpoint's cached blocks eagerly instead of
    * waiting for the ContextCleaner: up to maxIter label-table copies
    * would otherwise sit in executor storage until GC. */
  /** Unpersist a localCheckpoint'ed plan's backing RDD (shared with the
    * BPE merge loop, which uses the same materialize-and-release round
    * pattern). */
  private[graft] def release(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => () // not a checkpointed plan (or internals changed): let GC handle it
    }
}
