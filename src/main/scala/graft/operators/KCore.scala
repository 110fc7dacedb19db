package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-core decomposition by distributed peeling.
  *
  * The k-core is the maximal subgraph in which every node has degree
  * ≥ k — the standard graph-density signal (spam rings and boilerplate
  * clusters in a link/co-occurrence graph live in high cores; isolated
  * long-tail content does not). Matula & Beck 1983 give the sequential
  * peel; this is the bulk-synchronous formulation: each round drops
  * EVERY node currently under-degree at once, which converges to the
  * same fixpoint (peeling is confluent — removal order cannot save a
  * node).
  *
  * Scale shape per round: one edge-sized degree aggregate (single
  * explode scan), one node-sized survivor filter, two hash semi-joins
  * to restrict the edge list, then a localCheckpoint so the next
  * round's plan starts from materialized edges instead of a growing
  * self-referenced tree ([[Materialize]] — checkpoint + stats reset,
  * so carried size estimates can't compound across rounds). The only
  * driver-side values are the per-round edge counts (1-row actions)
  * used for the convergence test; rounds are O(peeling depth), which
  * is ≤ max coreness, not O(nodes).
  */
object KCore {

  /** Nodes of the k-core of a canonical undirected edge list
    * (`u` < `v`, deduped, loop-free — [[Triangles.orientById]] shape).
    * Returns a single-column `node` frame; empty when the k-core is.
    */
  def nodes(canonEdges: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val core = peel(canonEdges.localCheckpoint(), k)
    Triangles.degrees(core).where(col("deg") >= k).select(col("node"))
  }

  /** Peels an already-materialized canonical edge list down to its
    * k-core edge set (fixpoint of drop-all-under-degree rounds).
    * Input MUST be checkpointed/materialized — the loop re-counts it.
    * `logTag` distinguishes [[coreness]]'s per-level peels (which
    * start from the previous level's fixpoint, so their depths differ
    * from a from-scratch peel at the same k) in the depth log the
    * sf1 sweep's oracle-unroll proof parses.
    */
  private def peel(checkpointed: DataFrame, k: Int,
                   logTag: String = ""): DataFrame = {
    var edges = checkpointed
    var edgeCount = edges.count()
    var converged = edgeCount == 0L
    var rounds = 0
    while (!converged) {
      val survivors = Materialize(Triangles.degrees(edges)
        .where(col("deg") >= k)
        .select(col("node"))) // feeds BOTH semi-joins below
      val pruned = Materialize(edges
        .join(survivors.select(col("node").as("u")), Seq("u"), "left_semi")
        .join(survivors.select(col("node").as("v")), Seq("v"), "left_semi")
        .select(col("u"), col("v")))
      val prunedCount = pruned.count()
      converged = prunedCount == edgeCount
      edges = pruned
      edgeCount = prunedCount
      if (edgeCount == 0L) converged = true
      rounds += 1
    }
    // depth log (KTruss discipline): lets an unrolled SQL mirror prove
    // its round count covers the measured convergence depth at any SF
    System.err.println(
      s"[kcore] k=$k$logTag fixpoint after $rounds rounds, $edgeCount edges")
    edges
  }

  /** Coreness (max k with the node in the k-core) for every node.
    *
    * Peels INCREMENTALLY: the (k+1)-core is a subgraph of the k-core,
    * so each level starts from the previous level's surviving edges
    * instead of re-peeling the full graph — level k's work is
    * proportional to the k-core, which shrinks as k grows. Iterates
    * until the core empties, so every node gets its TRUE coreness;
    * `maxK` is only a safety bound for adversarial graphs (nodes
    * still in the maxK-core when it is hit are reported as maxK —
    * pass `Int.MaxValue`-ish bounds freely, the loop exits on the
    * empty core long before).
    */
  def coreness(canonEdges: DataFrame, maxK: Int): DataFrame = {
    require(maxK >= 1, s"maxK must be >= 1, got $maxK")
    var edges = Materialize(canonEdges)
    var acc = Materialize(Triangles.degrees(edges)
      .select(col("node"), lit(0).as("coreness")))
    var k = 1
    var empty = edges.isEmpty
    while (k <= maxK && !empty) {
      edges = peel(edges, k, logTag = "@core")
      empty = edges.isEmpty
      if (!empty) {
        val inCore = Triangles.degrees(edges)
          .select(col("node"), lit(k).as("k"))
        acc = Materialize(acc.join(inCore, Seq("node"), "left")
          .select(col("node"),
            coalesce(col("k"), col("coreness")).as("coreness"))
          ) // node-sized; caps lineage + carried stats across levels
      }
      k += 1
    }
    acc
  }
}
