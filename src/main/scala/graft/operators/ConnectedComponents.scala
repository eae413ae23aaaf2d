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
    var labels = vertices
      .select(col(idCol).as("id"), col(idCol).as("component"))
      .localCheckpoint(true)
    var converged = false
    var iter = 0
    while (!converged && iter < maxIter) {
      val nbrMin = sym
        .join(labels, sym("src") === labels("id"))
        .groupBy(col("dst")).agg(min(col("component")).as("nbr_min"))
      val next = labels
        .join(nbrMin, labels("id") === nbrMin("dst"), "left")
        .select(labels("id"),
          least(col("component"), coalesce(col("nbr_min"), col("component")))
            .as("component"))
        .localCheckpoint(true)
      converged = next
        .join(labels.withColumnRenamed("component", "prev"), "id")
        .filter(col("component") =!= col("prev"))
        .isEmpty
      labels = next
      iter += 1
    }
    require(converged,
      s"ConnectedComponents: not converged after $maxIter rounds")
    labels
  }
}
