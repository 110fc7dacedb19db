package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by distributed edge peeling.
  *
  * The k-truss is the maximal subgraph in which EVERY EDGE closes at
  * least k−2 triangles (Cohen 2008) — a strictly stronger cohesion
  * notion than the k-core's degree bound (a star has high degrees but
  * zero triangles; a community has both). The standard distributed
  * formulation: per round, count each surviving edge's triangle
  * support with the degree-oriented wedge join (the [[Triangles]]
  * machinery — O(√m) out-degree bound, no hub blowup), drop every
  * under-supported edge at once, repeat to fixpoint. Bulk-synchronous
  * removal converges to the same fixpoint as sequential peeling
  * (support only falls when edges leave, so no removal order can save
  * an edge).
  *
  * Scale shape per round: one orientation + two wedge equi-joins +
  * an edge-keyed support aggregate — all edge/wedge-sized and hash
  * partitioned; the surviving edge list is localCheckpoint'ed per
  * round (the Components/KCore discipline) and the only driver value
  * is the per-round edge count for the convergence test.
  */
object KTruss {

  /** Edges of the k-truss of a canonical undirected edge list
    * (`u` < `v`, deduped, loop-free). Returns the surviving canonical
    * edges; empty when no edge closes k−2 triangles.
    */
  def edges(canonEdges: DataFrame, k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k=2 is every edge), got $k")
    val minSupport = (k - 2).toLong
    var edges = canonEdges.localCheckpoint()
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    while (!converged) {
      // support per canonical edge = triangles through it. Enumerate
      // each triangle once on the degree-oriented list, then credit
      // its three edges back in canonical (u<v) form.
      val o = Triangles.orientByDegreeCanonical(edges,
        Triangles.degrees(edges)).localCheckpoint()
      val tri = o.as("e1")
        .join(o.as("e2"), col("e1.v") === col("e2.u"))
        .join(o.as("e3"),
          col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
        .select(col("e1.u").as("a"), col("e1.v").as("b"),
          col("e2.v").as("c"))
      val support = tri.select(explode(array(
          struct(least(col("a"), col("b")).as("u"),
                 greatest(col("a"), col("b")).as("v")),
          struct(least(col("b"), col("c")).as("u"),
                 greatest(col("b"), col("c")).as("v")),
          struct(least(col("a"), col("c")).as("u"),
                 greatest(col("a"), col("c")).as("v")))).as("e"))
        .select(col("e.u").as("u"), col("e.v").as("v"))
        .groupBy(col("u"), col("v"))
        .agg(count(lit(1)).as("support"))
      val pruned = edges.join(
          support.where(col("support") >= minSupport)
            .select(col("u"), col("v")),
          Seq("u", "v"), "left_semi")
        .localCheckpoint()
      val prunedCount = pruned.count()
      converged = prunedCount == edgeCount
      edges = pruned
      edgeCount = prunedCount
      if (edgeCount == 0L) converged = true
    }
    edges
  }

  /** Nodes of the k-truss (endpoints of surviving edges). */
  def nodes(canonEdges: DataFrame, k: Int): DataFrame =
    Triangles.degrees(edges(canonEdges, k)).select(col("node"))
}
