package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-source breadth-first search over an unweighted graph:
  * shortest hop-distance from any source to every reachable node
  * within `maxHops`.
  *
  * Frontier formulation (the Pregel shape as DataFrame ops): at hop h
  * only the nodes FIRST REACHED at h-1 probe their edges; nodes
  * already labeled are excluded with an anti join. In an unweighted
  * graph first-reach distance IS the minimum distance, so no
  * re-relaxation pass is needed. Per iteration the join probe is
  * frontier-sized, not visited-set-sized — on a 100 TB graph the work
  * per hop tracks the expanding wave, and the edge list (checkpointed
  * once, partitioned on `src`) never re-shuffles.
  *
  * Distances are exact integers → the driver query is fully
  * DuckDB-oracle-checkable (recursive CTE), unlike PageRank's
  * shuffle-order doubles.
  */
object Bfs {

  /** `edges` (`src`, `dst`, LongType) are followed as directed; pass
    * both directions for an undirected walk. `sources`: one `node`
    * column. Returns (node, dist) for every node within `maxHops`.
    */
  def distances(edges: DataFrame, sources: DataFrame,
                maxHops: Int): DataFrame = {
    require(maxHops >= 0, s"maxHops must be >= 0: $maxHops")
    val e = edges.select(col("src"), col("dst")).distinct()
      .localCheckpoint(false) // reused by every hop
    var dist = sources.select(col("node")).distinct()
      .withColumn("dist", lit(0))
      .localCheckpoint(false)
    var frontier = dist
    for (h <- 1 to maxHops) {
      val reached = frontier
        .join(e, frontier("node") === e("src"))
        .select(col("dst").as("node")).distinct()
      val fresh = Materialize(reached.join(dist, Seq("node"), "left_anti")
        .withColumn("dist", lit(h)),
        eager = false) // next hop's probe side
      dist = Materialize(dist.union(fresh), eager = false)
      frontier = fresh
    }
    dist
  }
}
