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

  /** Edge count at or below which the fixpoint runs on the driver:
    * one collect instead of ~depth blocking Spark jobs. Dimension
    * hierarchies (the documented use) are thousands of edges; the
    * worst-case in-memory closure at this bound (~100k edges × depth
    * ≤ 32) is a few million string pairs — comfortably driver-sized.
    */
  val DriverSideEdgeLimit: Long = 100_000L

  /** Edge count at or below which the distributed fixpoint broadcasts
    * the (static) edge list into every iteration's join. Above it the
    * hint is withheld and the planner falls back to a shuffle join —
    * an unconditional hint would bypass Spark's size-based broadcast
    * protection and can OOM the driver/executors on a genuinely large
    * edge list (the only input that reaches the distributed branch).
    * ~2M string-pair rows is comfortably under the 8 GB broadcast
    * ceiling while covering any realistic dimension hierarchy.
    */
  val BroadcastEdgeLimit: Long = 2_000_000L

  /** Returns the closure as columns (`ancestor`, `descendant`).
    * Reflexive pairs are NOT included for DAGs (matches the reference:
    * a node does not contribute to itself twice).
    *
    * Strategy is size-adaptive: at or under [[DriverSideEdgeLimit]]
    * edges the fixpoint runs in driver memory (the edge list is the
    * dimension side — collecting it is one small job, vs. one
    * join+distinct+count job per depth level); above it, the fully
    * distributed loop below. Both paths enforce the same maxDepth
    * contract.
    */
  def closure(edges: DataFrame, parentCol: String, childCol: String,
              maxDepth: Int = 32,
              driverSideEdgeLimit: Long = DriverSideEdgeLimit,
              broadcastEdgeLimit: Long = BroadcastEdgeLimit): DataFrame = {
    val base = edges
      .select(col(parentCol).cast("string").as("ancestor"),
              col(childCol).cast("string").as("descendant"))
      .where(col("ancestor").isNotNull && col("descendant").isNotNull)
      .distinct()
      .localCheckpoint()

    val baseCount = base.count()
    if (baseCount <= driverSideEdgeLimit)
      return closureInMemory(base, maxDepth)

    // Broadcast the static edge side only while it is provably small —
    // then no iteration shuffles the growing path set for the join and
    // the only exchange left is the distinct. Past the bound, let the
    // planner choose (shuffle join), which scales instead of OOMing.
    val edgeSide: DataFrame => DataFrame =
      if (baseCount <= broadcastEdgeLimit) broadcast(_) else identity

    var paths = base
    var prevCount = baseCount
    var iter = 0
    var converged = false
    while (!converged && iter < maxDepth) {
      val extended = paths.as("p")
        .join(edgeSide(base.as("e")), col("p.descendant") === col("e.ancestor"))
        .select(col("p.ancestor").as("ancestor"),
                col("e.descendant").as("descendant"))
      // lazy checkpoint: the count() below materializes it, so each
      // iteration costs ONE job instead of checkpoint+count.
      val grown = Materialize(paths.union(extended).distinct(),
        eager = false)
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

  /** Fully distributed closure by PATH DOUBLING: each iteration joins
    * the known path set with ITSELF (`paths ⋈ paths` instead of
    * `paths ⋈ edges`), so reachable path length doubles per step and a
    * depth-D hierarchy converges in ⌈log₂ D⌉ + 1 iterations instead of
    * D. The trade: every iteration shuffles the full (growing) path
    * set on the join key — heavier per step than the broadcast
    * edge-extension in [[closure]] — so prefer this variant only when
    * the hierarchy is DEEP (chains, thread ancestries, bill-of-
    * materials with hundreds of levels), where cutting the number of
    * blocking jobs from D to log D dominates.
    */
  def closureDoubling(edges: DataFrame, parentCol: String, childCol: String,
                      maxIters: Int = 16): DataFrame = {
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
    while (!converged && iter < maxIters) {
      val doubled = paths.as("p")
        .join(paths.as("q"), col("p.descendant") === col("q.ancestor"))
        .select(col("p.ancestor").as("ancestor"),
                col("q.descendant").as("descendant"))
      val grown = Materialize(paths.union(doubled).distinct(),
        eager = false)
      val n = grown.count()
      converged = n == prevCount
      prevCount = n
      paths = grown
      iter += 1
    }
    if (!converged)
      throw new IllegalStateException(
        s"Hierarchy.closureDoubling did not converge within $maxIters " +
          s"iterations (the last must observe no growth, so depth up to " +
          s"2^${maxIters - 1} is supported) — the edge list is cyclic or " +
          "astronomically deep")
    paths
  }

  /** Driver-side fixpoint over a collected dimension edge list — same
    * semantics and maxDepth contract as the distributed loop, zero
    * per-iteration Spark jobs.
    */
  private def closureInMemory(base: DataFrame, maxDepth: Int): DataFrame = {
    val spark = base.sparkSession
    val edges = base.collect().map(r => (r.getString(0), r.getString(1)))
    val children: Map[String, Array[String]] =
      edges.groupBy(_._1).map { case (p, es) => p -> es.map(_._2) }
    val paths = scala.collection.mutable.HashSet.empty[(String, String)]
    paths ++= edges
    var frontier: Set[(String, String)] = edges.toSet
    var iter = 0
    while (frontier.nonEmpty && iter < maxDepth) {
      frontier = for {
        (a, d) <- frontier
        d2 <- children.getOrElse(d, Array.empty[String])
        if paths.add((a, d2))
      } yield (a, d2)
      iter += 1
    }
    if (frontier.nonEmpty)
      throw new IllegalStateException(
        s"Hierarchy.closure did not converge within maxDepth=$maxDepth " +
          "iterations — the edge list is cyclic or deeper than maxDepth; " +
          "raise maxDepth or break the cycle")
    import spark.implicits._
    spark.createDataset(paths.toSeq.sorted).toDF("ancestor", "descendant")
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
