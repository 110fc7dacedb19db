package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** k-truss decomposition by distributed edge peeling with INCREMENTAL
  * support maintenance.
  *
  * The k-truss is the maximal subgraph in which EVERY EDGE closes at
  * least k−2 triangles (Cohen 2008) — a strictly stronger cohesion
  * notion than the k-core's degree bound (a star has high degrees but
  * zero triangles; a community has both). Bulk-synchronous removal
  * converges to the same fixpoint as sequential peeling (support only
  * falls when edges leave, so no removal order can save an edge).
  *
  * Why incremental: the naive formulation re-enumerates ALL triangles
  * of the surviving graph every round to recompute support — at the
  * catalog's decomposition settings that is ~23 full wedge joins
  * (4+5+6+8 rounds across levels 3..6 at the sf0.01 gate), and the
  * round count grows with graph depth, so the cost is
  * rounds × triangles: 137 s at sf0.1 and unbounded at 100 TB. This
  * implementation instead:
  *
  *  1. enumerates triangles ONCE to seed per-edge support;
  *  2. per removal round, enumerates only the triangles that CONTAIN a
  *     removed edge — three wedge joins each DRIVEN from the removed
  *     set through the surviving adjacency, so the round costs wedges
  *     incident to removed edges, not the whole graph;
  *  3. decrements the surviving edges of each killed triangle by one
  *     (a triangle with 1–3 removed edges dies exactly once, and each
  *     of its surviving edges loses exactly that one triangle — bulk
  *     removal needs no sequential tie-breaking);
  *  4. fixpoint/level-advance checks are a filter on the maintained
  *     support column — free, where the naive loop paid a full
  *     enumeration to discover "nothing changed".
  *
  * Total triangle work across an entire decomposition is therefore
  * O(one full enumeration + wedges incident to every removed edge) —
  * amortized 2–3 enumerations regardless of round count. Mass
  * removals of triangle-free edges (support 0, the long tail of a
  * co-occurrence graph) drive the wedge joins with edges that close
  * nothing and cost ~nothing.
  *
  * Orientation: the acyclic (degree, id) total order is computed ONCE
  * from the INITIAL graph and kept for every round — any fixed total
  * order on nodes stays acyclic on every subgraph, so removals never
  * force re-orientation, and the initial order keeps the
  * Schank–Wagner O(√m) out-degree bound of the seed enumeration
  * (degrees only shrink under peeling). State per round is one
  * edge-sized frame `(x, y, support)` in oriented form, materialized
  * via [[Materialize]] (localCheckpoint + stats reset — carried
  * `originStats` otherwise compound geometrically across rounds and
  * turn Catalyst planning into the bottleneck); the only driver value
  * is the removed-edge count for the branch decision.
  */
object KTruss {

  private val T = "trussness"

  /** Oriented initial state `(x, y, support)`: (degree, id)-oriented
    * edges seeded with their exact triangle support (one full
    * enumeration — the only whole-graph triangle join in any peel).
    */
  private def seed(canonEdges: DataFrame): DataFrame = {
    val canon = canonEdges.localCheckpoint()
    val o = Triangles
      .orientByDegreeCanonical(canon, Triangles.degrees(canon))
      .select(col("u").as("x"), col("v").as("y"))
      .localCheckpoint() // referenced 3× by the seed enumeration
    val support = o.as("e1")
      .join(o.as("e2"), col("e1.y") === col("e2.x"))
      .join(o.as("e3"),
        col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"),
        col("e2.y").as("c"))
      // credit the triangle to its three oriented edges (a→b, b→c, a→c)
      .select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("c").as("y")),
        struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("support"))
    Materialize(o.join(support, Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        coalesce(col("support"), lit(0L)).as("support")))
  }

  /** One removal step at `minSupport`: drop every under-supported edge,
    * enumerate the triangles those edges were part of (each pattern
    * join driven from the removed set), decrement the surviving
    * edges. Returns (new state, removed oriented edges, removedCount);
    * removedCount == 0 means `state` was already the fixpoint.
    *
    * Measured and rejected: broadcast-hinting the removed set (and a
    * materialized decrement table) into the round's joins — on
    * local[32] at sf0.1 the per-round driver collect + rebroadcast
    * cost MORE than the 32-partition shuffles it replaced (54.5 s →
    * 69.3 s for the full decomposition). On a many-executor cluster
    * the trade flips for small removed sets; revisit with the
    * session's autoBroadcastJoinThreshold rather than a hint if that
    * ever matters.
    */
  private def step(state: DataFrame,
                   minSupport: Long): (DataFrame, DataFrame, Long) = {
    val r = Materialize(state.where(col("support") < minSupport)
      .select(col("x"), col("y")))
    val removed = r.count()
    if (removed == 0L) return (state, r, 0L)
    // a killed triangle's other edges may themselves be in r (then
    // they take no decrement) but the triangle must still be found
    // through them, so two adjacency views: o = BEFORE removal,
    // surv = survivors only
    val o = state.select(col("x"), col("y"))
    val surv = state.where(col("support") >= minSupport)
      .select(col("x"), col("y"))
    // triangle pattern (e1: a→b, e2: b→c, e3: a→c) with the removed
    // edge at each of the three positions. Two structural choices do
    // the heavy lifting: (1) the removed set is in the FIRST join of
    // each pattern, so every wedge join is driven by removed edges'
    // adjacency — an o⋈o prefix would re-materialize the full wedge
    // set and give back the recount cost this operator exists to
    // avoid; (2) the patterns are DISJOINT by construction (later
    // positions pair the removed edge only with SURVIVING earlier
    // positions), so each killed triangle is produced exactly once
    // and no distinct() shuffle is needed.
    val p1 = r.as("e1") // e1 removed; e2, e3 anything
      .join(o.as("e2"), col("e1.y") === col("e2.x"))
      .join(o.as("e3"),
        col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"),
        col("e2.y").as("c"))
    val p2 = r.as("e2") // e2 removed; e1 surviving, e3 anything
      .join(surv.as("e1"), col("e1.y") === col("e2.x"))
      .join(o.as("e3"),
        col("e3.x") === col("e1.x") && col("e3.y") === col("e2.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"),
        col("e2.y").as("c"))
    val p3 = r.as("e3") // e3 removed; e1, e2 surviving
      .join(surv.as("e1"), col("e1.x") === col("e3.x"))
      .join(surv.as("e2"),
        col("e2.x") === col("e1.y") && col("e2.y") === col("e3.y"))
      .select(col("e1.x").as("a"), col("e1.y").as("b"),
        col("e2.y").as("c"))
    val killed = p1.union(p2).union(p3)
    // decrement the surviving edges of each killed triangle; exploded
    // edges that are themselves removed simply find no match in the
    // left join below, so no anti-join is needed
    val dec = killed
      .select(explode(array(
        struct(col("a").as("x"), col("b").as("y")),
        struct(col("b").as("x"), col("c").as("y")),
        struct(col("a").as("x"), col("c").as("y")))).as("e"))
      .select(col("e.x").as("x"), col("e.y").as("y"))
      .groupBy("x", "y")
      .agg(count(lit(1)).as("d"))
    val next = state.where(col("support") >= minSupport)
      .join(dec, Seq("x", "y"), "left")
      .select(col("x"), col("y"),
        (col("support") - coalesce(col("d"), lit(0L))).as("support"))
    (Materialize(next), r, removed)
  }

  /** Peel `state` to the fixpoint at `minSupport`, feeding each
    * round's removed edges to `onRemoved`. Logs the round count in the
    * same "rounds to fixpoint" terms as a recount peel (removal rounds
    * + the final no-change check) — the sf1 sweep's oracle-unroll
    * depth proof parses these lines.
    */
  private def peel(state0: DataFrame, minSupport: Long)
                  (onRemoved: DataFrame => Unit): DataFrame = {
    var state = state0
    var rounds = 1 // the closing no-change round a recount peel pays
    var done = false
    while (!done) {
      val t0 = System.nanoTime()
      val (next, r, removed) = step(state, minSupport)
      if (sys.env.contains("GRAFT_KTRUSS_TRACE"))
        System.err.println(f"[ktruss-trace] minSupport=$minSupport " +
          f"round=$rounds removed=$removed ${(System.nanoTime() - t0) / 1e9}%.2fs")
      if (removed == 0L) done = true
      else { onRemoved(r); state = next; rounds += 1 }
    }
    System.err.println(
      s"[ktruss] minSupport=$minSupport fixpoint after $rounds rounds, " +
        s"${state.count()} edges")
    state
  }

  private def canonical(oriented: DataFrame): DataFrame =
    oriented.select(least(col("x"), col("y")).as("u"),
      greatest(col("x"), col("y")).as("v"))

  /** Edges of the k-truss of a canonical undirected edge list
    * (`u` < `v`, deduped, loop-free). Returns the surviving canonical
    * edges; empty when no edge closes k−2 triangles.
    */
  def edges(canonEdges: DataFrame, k: Int): DataFrame = {
    require(k >= 3, s"k must be >= 3 (k=2 is every edge), got $k")
    canonical(peel(seed(canonEdges), (k - 2).toLong)(_ => ()))
  }

  /** Nodes of the k-truss (endpoints of surviving edges). */
  def nodes(canonEdges: DataFrame, k: Int): DataFrame =
    Triangles.degrees(edges(canonEdges, k)).select(col("node"))

  /** Truss number per edge: the max k with the edge in the k-truss,
    * capped at `maxK` (edges still in the maxK-truss report maxK).
    * Every input edge appears; an edge in no 3-truss reports 2 (any
    * edge is trivially a 2-truss).
    *
    * The support state threads STRAIGHT THROUGH the levels — the
    * (k+1)-truss is a subgraph of the k-truss and the maintained
    * supports at level k's fixpoint ARE the supports the (k+1)-level
    * peel starts from, so advancing a level costs one filter. Edges
    * removed while peeling level k carry trussness k−1; the label
    * union is of per-round removed sets (each already materialized by
    * the peel), never a full-edge rewrite per level.
    */
  def trussness(canonEdges: DataFrame, maxK: Int): DataFrame = {
    require(maxK >= 3, s"maxK must be >= 3, got $maxK")
    var state = seed(canonEdges)
    val labeled = scala.collection.mutable.ArrayBuffer.empty[DataFrame]
    var k = 3
    var empty = state.isEmpty
    while (k <= maxK && !empty) {
      val level = k // stable capture for the callback
      state = peel(state, (k - 2).toLong) { r =>
        labeled += canonical(r).withColumn(T, lit(level - 1))
      }
      empty = state.isEmpty
      k += 1
    }
    val survivors = canonical(state).withColumn(T, lit(maxK))
    labeled.foldLeft(survivors)(_ unionByName _)
      .select(col("u"), col("v"), col(T))
  }
}
