package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed PageRank by power iteration (Page et al. 1999; the
  * GraphX/Pregel formulation re-expressed as DataFrame joins).
  *
  * Per iteration: every node sends `rank/outDegree` along its
  * out-edges (one shuffle join on `src`), contributions are summed per
  * destination (one grouped aggregate), and dangling-node mass — nodes
  * with no out-edges — is redistributed uniformly so total rank stays
  * 1. State is one (node, rank) row per node; the edge list is
  * pre-joined with out-degrees ONCE and checkpointed, so each
  * iteration reuses a materialized, lineage-free input (the same
  * pattern as Components' hash-min propagation). At 100 TB the edge
  * list partitions on `src` and every iteration reuses that
  * partitioning — the join never re-shuffles the big side.
  *
  * Ranks are doubles: shuffle-order addition makes the low bits
  * run-dependent, so PageRank is property-tested (fixed points,
  * conservation, agreement with a driver-side reference within 1e-9)
  * rather than hash-compared against a SQL oracle.
  */
object PageRank {

  /** `edges`: two LongType columns `src`, `dst` (parallel edges are
    * NOT deduplicated — they weight the walk, matching GraphX).
    * Returns (node, rank) with ranks summing to 1.
    */
  def run(edges: DataFrame, iters: Int, damping: Double = 0.85,
          src: String = "src", dst: String = "dst"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst")))
      .distinct()
      .localCheckpoint(false) // lazy: reused by every iteration
    val n = nodes.count()
    if (n == 0) return nodes.withColumn("rank", lit(0.0))
    val outDeg = e.groupBy("src").agg(count(lit(1)).as("__deg"))
    val edgesDeg = e.join(outDeg, "src")
      .localCheckpoint(false) // the per-iteration join probe side
    // nodes with no out-edges — static, computed once; only their
    // rank SUM changes per iteration
    val danglingNodes = nodes
      .join(outDeg.withColumnRenamed("src", "node"), Seq("node"),
            "left_anti")
      .localCheckpoint(false)
    var ranks = nodes.withColumn("rank", lit(1.0 / n))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
                (col("rank") / col("__deg")).as("__c"))
      val inMass = contribs.groupBy("node").agg(sum(col("__c")).as("__m"))
      // dangling mass as a 1-row aggregate cross-joined into the
      // update — the whole iteration stays IN the plan (no .head()
      // driver round-trip per iteration; at cluster scale a per-
      // iteration action serializes the job queue)
      val dangling = ranks
        .join(danglingNodes, Seq("node"), "left_semi")
        .agg(coalesce(sum(col("rank")), lit(0.0)).as("__dm"))
      ranks = nodes.join(inMass, Seq("node"), "left")
        .crossJoin(dangling) // single row → broadcast
        .select(col("node"),
                (lit((1.0 - damping) / n) +
                  lit(damping) *
                    (coalesce(col("__m"), lit(0.0)) + col("__dm") / n))
                  .as("rank"))
        .localCheckpoint(false) // cut the iteration's lineage growth
    }
    ranks
  }
}
