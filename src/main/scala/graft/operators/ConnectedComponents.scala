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
  * @param vertices one column: the vertex id (any orderable numeric)
  * @param edges    two columns: `src`, `dst` — ONE row per undirected edge
  *                 (symmetrization happens here)
  * @return (id, component) where component = min vertex id reachable
  */
object ConnectedComponents {
  def run(vertices: DataFrame, edges: DataFrame, maxIter: Int = 25): DataFrame = {
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
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("nbr_min"))
      // prev rides along so convergence is a filter on `next` itself — no
      // second full join of the label table per round
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"),
          col("component").as("prev"))
        .localCheckpoint(true)
      converged = next.filter(col("component") =!= col("prev")).isEmpty
      release(ckpt)
      ckpt = next
      labels = next.select("id", "component")
      iter += 1
    }
    require(converged,
      s"ConnectedComponents: not converged after $maxIter rounds")
    val out = labels
    release(sym)
    out
  }

  /** Free a superseded localCheckpoint's cached blocks eagerly instead of
    * waiting for the ContextCleaner: up to maxIter label-table copies
    * would otherwise sit in executor storage until GC. */
  private def release(df: DataFrame): Unit =
    df.queryExecution.optimizedPlan match {
      case r: org.apache.spark.sql.execution.LogicalRDD => r.rdd.unpersist(false)
      case _ => () // not a checkpointed plan (or internals changed): let GC handle it
    }
}
