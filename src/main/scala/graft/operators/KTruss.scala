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

  /** Peel `checkpointed` (canonical, materialized) down to the
    * fixpoint where every surviving edge has triangle support ≥
    * `minSupport`. Input MUST be checkpointed — the loop re-counts it.
    */
  private def peelFrom(checkpointed: DataFrame,
                       minSupport: Long): DataFrame = {
    var edges = checkpointed
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var rounds = 0
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
      rounds += 1
      if (edgeCount == 0L) converged = true
    }
    System.err.println(
      s"[ktruss] minSupport=$minSupport fixpoint after $rounds rounds, " +
        s"$edgeCount edges")
    edges
  }

  /** Edges of the k-truss of a canonical undirected edge list
    * (`u` < `v`, deduped, loop-free). Returns the surviving canonical
    * edges; empty when no edge closes k−2 triangles.
    */
  def edges(canonEdges: DataFrame, k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k=2 is every edge), got $k")
    peelFrom(canonEdges.localCheckpoint(), (k - 2).toLong)
  }

  /** Nodes of the k-truss (endpoints of surviving edges). */
  def nodes(canonEdges: DataFrame, k: Int): DataFrame =
    Triangles.degrees(edges(canonEdges, k)).select(col("node"))

  /** Truss number per edge: the max k with the edge in the k-truss,
    * capped at `maxK` (edges still in the maxK-truss report maxK).
    * Every input edge appears; an edge in no 3-truss reports 2 (any
    * edge is trivially a 2-truss).
    *
    * Peels INCREMENTALLY — the same free win the coreness loop gets
    * from (k+1)-core ⊆ k-core: the (k+1)-truss is a subgraph of the
    * k-truss, so level k+1 starts from level k's surviving edges
    * instead of re-peeling the full graph. Level k's work is
    * proportional to the k-truss, which shrinks as k grows; the
    * accumulator is edge-sized and localCheckpoint'ed per level.
    */
  def trussness(canonEdges: DataFrame, maxK: Int): DataFrame = {
    require(maxK >= 3, s"maxK must be >= 3, got $maxK")
    var edges = canonEdges.localCheckpoint()
    var acc = edges.select(col("u"), col("v"), lit(2).as("trussness"))
      .localCheckpoint()
    var k = 3
    var empty = edges.isEmpty
    while (k <= maxK && !empty) {
      edges = peelFrom(edges, (k - 2).toLong)
      empty = edges.isEmpty
      if (!empty) {
        acc = acc.join(edges.select(col("u"), col("v"), lit(k).as("k")),
            Seq("u", "v"), "left")
          .select(col("u"), col("v"),
            coalesce(col("k"), col("trussness")).as("trussness"))
          .localCheckpoint() // edge-sized; caps lineage across levels
      }
      k += 1
    }
    acc
  }
}
