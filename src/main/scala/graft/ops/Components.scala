package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Connected components by iterative min-label propagation — the transitive
  * closure that turns near-dup PAIRS into dedup CLUSTERS (keep one doc per
  * component, not per pair).
  *
  * Each iteration: every node adopts the minimum label among itself and its
  * neighbors; converges in O(component diameter) rounds. Near-dup graphs
  * are overwhelmingly tiny cliques/chains, so this is 2-4 rounds in
  * practice. `localCheckpoint` truncates the lineage each round — without
  * it the plan doubles per iteration and the driver OOMs on plan trees
  * long before data is a problem.
  *
  * The driver-side convergence check is one count per round (a scalar,
  * not a collect of data). At extreme scale the same loop runs on
  * GraphFrames/Pregel; semantics are identical.
  */
object Components {

  /** @param edges     (src, dst) pairs, any orientation
    * @param vertices  one column `id` — isolated vertices keep their own id
    * @return (id, component) — component = min id in the component */
  def connectedComponents(
      vertices: DataFrame,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50): DataFrame = {
    val sym = edges.select(col(srcCol).as("a"), col(dstCol).as("b"))
      .union(edges.select(col(dstCol).as("a"), col(srcCol).as("b")))
      .distinct()
      .localCheckpoint()

    var labels = vertices.select(col("id"), col("id").as("component"))
      .localCheckpoint()
    var iter = 0
    var converged = false
    while (!converged && iter < maxIter) {
      val neighborMin = sym
        .join(labels.withColumnRenamed("id", "b"), Seq("b"))
        .groupBy(col("a").as("id"))
        .agg(min(col("component")).as("nmin"))
      // carry the previous label through the propagation pass so the
      // convergence probe is a filter on the checkpointed result, not a
      // second next⋈labels join per round
      val next = labels.join(neighborMin, Seq("id"), "left")
        .select(col("id"), col("component").as("prev"),
          least(col("component"), coalesce(col("nmin"), col("component"))).as("component"))
        .localCheckpoint()
      val changed = next.filter(col("component") =!= col("prev")).limit(1).count()
      labels = next.select(col("id"), col("component"))
      converged = changed == 0
      iter += 1
    }
    // fail LOUDLY: returning a half-propagated labeling would silently
    // split clusters (dedup would keep duplicate documents with no signal)
    if (!converged) throw new IllegalStateException(
      s"connectedComponents did not converge in $maxIter iterations — " +
        "a component's diameter exceeds maxIter; raise it (labels advance one hop/round)")
    labels
  }
}
