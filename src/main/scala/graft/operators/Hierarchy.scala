package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Transitive closure of a parent→child edge list — the Spark-first
  * re-expression of the reference's recursive `expand_hierarchy`
  * (`gpd_etl_pipeline.R:347-388`, SURVEY §2.4 J5).
  *
  * Catalyst has no recursion primitive we can rely on across versions,
  * so the fixpoint is driver-side *control flow* around fully
  * distributed joins: each iteration extends every known
  * (ancestor, descendant) path by one edge, unions, dedups, and stops
  * when the path count stops growing.
  *
  * Scale notes:
  *   - each iteration is one shuffle join + one distinct; iteration
  *     count = hierarchy depth (≤ 4 in the reference, log-bounded in
  *     general), not data size;
  *   - `localCheckpoint` truncates lineage so plans don't grow
  *     exponentially with depth (on a real cluster with a fault-
  *     tolerance requirement, swap for `checkpoint` on durable
  *     storage);
  *   - the edge list is the *dimension side* (thousands of rows even
  *     for large hierarchies); the 100 TB fact table is only touched
  *     once, by the caller's single fan-out join against the closure.
  */
object Hierarchy {

  /** Returns the closure as columns (`ancestor`, `descendant`).
    * Reflexive pairs are NOT included (matches the reference: a node
    * does not contribute to itself twice).
    */
  def closure(edges: DataFrame, parentCol: String, childCol: String,
              maxDepth: Int = 32): DataFrame = {
    val base = edges
      .select(col(parentCol).cast("string").as("ancestor"),
              col(childCol).cast("string").as("descendant"))
      .where(col("ancestor").isNotNull && col("descendant").isNotNull)
      .distinct()
      .localCheckpoint()

    var paths = base
    var prevCount = paths.count()
    var iter = 0
    var converged = false
    while (!converged && iter < maxDepth) {
      // edge list is the dimension side (closure() contract) — keep it
      // broadcast so no iteration ever shuffles the growing path set
      // for the join; the only exchange left is the distinct.
      val extended = paths.as("p")
        .join(broadcast(base.as("e")), col("p.descendant") === col("e.ancestor"))
        .select(col("p.ancestor").as("ancestor"),
                col("e.descendant").as("descendant"))
      // lazy checkpoint: the count() below materializes it, so each
      // iteration costs ONE job instead of checkpoint+count.
      val grown = paths.union(extended).distinct().localCheckpoint(false)
      val n = grown.count()
      converged = n == prevCount
      prevCount = n
      paths = grown
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Hierarchy.closure did not converge within maxDepth=$maxDepth " +
          "iterations — the edge list is cyclic or deeper than maxDepth; " +
          "raise maxDepth or break the cycle")
    paths
  }

  /** Roll a per-leaf measure up to every ancestor through the closure
    * (SURVEY §2.4 J6 + §2.5 A2): one M:N fan-out join + one grouped
    * sum. `leaf` must expose `leafCol` and `valueCol`.
    */
  def rollup(closure: DataFrame, leaf: DataFrame,
             leafCol: String, valueCol: String): DataFrame =
    closure.join(leaf, closure("descendant") === leaf(leafCol))
      .groupBy(col("ancestor"))
      .agg(sum(col(valueCol)).as(valueCol))
}
