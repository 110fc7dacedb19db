package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed exact triangle counting over an undirected edge list.
  *
  * The standard shuffle-join formulation: orient every edge so each
  * triangle {a,b,c} survives as exactly one directed wedge pair, then
  * close wedges with two equi-joins. No adjacency lists are ever
  * materialized on one machine — state is edge-sized and hash
  * partitioned throughout.
  *
  * Two orientations:
  *   - [[orientById]]: low id -> high id. Simple, one shuffle fewer;
  *     fine when degrees are bounded (e.g. co-occurrence graphs with a
  *     per-row item cap).
  *   - [[orientByDegree]]: low (degree, id) -> high (degree, id) — the
  *     100 TB choice. Every node's out-neighbourhood is O(sqrt(m))
  *     (Schank & Wagner 2005), so the wedge join's fan-out is bounded
  *     even under power-law degrees where a single hub would otherwise
  *     produce deg² wedge candidates on one reducer.
  *
  * Both orientations are acyclic total orders, so [[count]] returns the
  * identical triangle count for either (pinned in TrianglesSpec).
  */
object Triangles {

  /** Canonical undirected edge list from possibly-duplicated, possibly
    * self-looped input: drops loops, orients u < v by id, dedups.
    * Input columns: `u`, `v` (integral node ids).
    */
  def orientById(edges: DataFrame): DataFrame =
    edges.where(col("u") =!= col("v"))
      .select(least(col("u"), col("v")).as("u"),
              greatest(col("u"), col("v")).as("v"))
      .distinct()

  /** Undirected degree of every node in a canonical edge list — ONE
    * explode scan (not a 2-scan union). Output: `node`, `deg`.
    */
  def degrees(canon: DataFrame): DataFrame =
    canon
      .select(explode(array(col("u"), col("v"))).as("node")) // 1 scan, not 2
      .groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("deg"))

  /** Re-orients a canonical edge list so every edge points from the
    * endpoint with lower (degree, id) to the higher one. Two extra
    * edge-sized shuffles (degree aggregate + two key lookups) buy the
    * O(sqrt(m)) out-degree bound that keeps the wedge join skew-free.
    */
  def orientByDegree(edges: DataFrame): DataFrame = {
    // the canonical edge list feeds THREE consumers (degree agg + two
    // key lookups): materialize it once — self-referencing plans
    // otherwise re-run the whole upstream dedup per reference, which
    // at sf0.1 costs more than the triangle joins themselves
    val canon = orientById(edges).localCheckpoint()
    orientByDegreeCanonical(canon, degrees(canon))
  }

  /** [[orientByDegree]] for callers that ALREADY hold a materialized
    * canonical edge list and its degree frame (e.g. a clustering-
    * coefficient query that needs `deg` again for the denominator):
    * skips the redundant re-canonicalization (an edge-wide distinct
    * shuffle) and the duplicate degree aggregate. `canon` should be
    * checkpointed/persisted by the caller — it is referenced three
    * times here.
    */
  def orientByDegreeCanonical(canon: DataFrame, deg: DataFrame): DataFrame = {
    val du = deg.select(col("node").as("u"), col("deg").as("du"))
    val dv = deg.select(col("node").as("v"), col("deg").as("dv"))
    canon.join(du, "u").join(dv, "v")
      .select(
        when(col("du") < col("dv")
            || (col("du") === col("dv") && col("u") < col("v")),
          struct(col("u").as("a"), col("v").as("b")))
          .otherwise(struct(col("v").as("a"), col("u").as("b")))
          .as("e"))
      .select(col("e.a").as("u"), col("e.b").as("v"))
  }

  /** Exact triangle count of an oriented (acyclic) edge list: wedges
    * (u->v->w) closed by a third edge (u->w). Two hash joins on single
    * integer keys; the closing join probes with the wedge set, which
    * the orientation keeps near-uniform.
    */
  def count(oriented: DataFrame): DataFrame = {
    val e = oriented.localCheckpoint() // referenced 3× below
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("triangles"))
  }

  /** Per-node triangle participation: every triangle is enumerated
    * once (any acyclic orientation), then credited to all three
    * corners. Feeds local clustering coefficients. Output: `node`,
    * `tri_cnt` (nodes in no triangle are absent — left-join + 0-fill
    * at the call site).
    */
  def perNode(oriented: DataFrame): DataFrame = {
    val e = oriented.localCheckpoint() // referenced 3× below
    e.as("e1")
      .join(e.as("e2"), col("e1.v") === col("e2.u"))
      .join(e.as("e3"),
        col("e3.u") === col("e1.u") && col("e3.v") === col("e2.v"))
      .select(explode(array(col("e1.u"), col("e1.v"), col("e2.v"))).as("node"))
      .groupBy("node")
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("tri_cnt"))
  }

  /** The oriented edge list with both endpoints' sorted out-neighbour
    * arrays attached — the shared front half of the ADJACENCY-
    * INTERSECTION formulation ([[countAdjacency]]/[[perNodeAdjacency]]).
    *
    * Why this beats the wedge join at scale: e1⋈e2 materializes and
    * SHUFFLES every wedge (Σ outdeg² rows — 1.4 B at sf1 on the
    * co-purchase graph) into the closing join. Here the same Σ outdeg²
    * work happens ROW-LOCALLY: two edge-sized hash joins attach the
    * (≤ O(√m) under degree orientation) neighbour arrays, and the
    * merge-scan intersection streams inside the projection — the wide
    * rows are never exchanged, nothing edge²-sized is ever resident.
    * One edge-sized checkpoint (the shared join input) instead of the
    * wedge pipeline's two.
    *
    * Node ids are cast to long; output columns `u`, `v`, `nu`, `nv`
    * (inner joins: an edge whose head has no out-neighbours closes no
    * triangle and is dropped — it would contribute 0).
    */
  private def withNeighborArrays(oriented: DataFrame): DataFrame = {
    val e = oriented
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .localCheckpoint(false) // adj build + probe side read the same blocks
    val adj = e.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    attachArrays(e, adj)
  }

  /** The two array-attach joins, SHUFFLE_HASH-pinned on the adjacency
    * side. Why the pin matters: the SECOND join re-partitions the
    * probe rows — which by then CARRY the first neighbour array — so
    * that exchange is wedge-sized (Σ outdeg² elements; ~38 GB raw at
    * the sf10 co-purchase graph), and the default sort-merge join
    * then EXTERNALLY SORTS those wide rows on top of shuffling them.
    * The wedge-sized exchange is inherent to the dataflow (u- and
    * v-partitionings can't coincide), but the sort is pure overhead:
    * hash-building from the adjacency side (edge-sized: Σ outdeg = m
    * elements, hash-partitioned so each task holds m/P) lets the wide
    * rows STREAM through both joins. The r14 sf10 cell (401.8 s) was
    * this sort's spill traffic, not the joins' arithmetic.
    */
  private def attachArrays(e: DataFrame, adj: DataFrame): DataFrame =
    e.join(adj.select(col("u"), col("nbrs").as("nu")).hint("shuffle_hash"),
        "u")
      .join(adj.select(col("u").as("v"), col("nbrs").as("nv"))
        .hint("shuffle_hash"), "v")

  /** Exact triangle count via sorted-adjacency intersection:
    * Σ over oriented edges (u,v) of |N⁺(u) ∩ N⁺(v)| — each triangle's
    * unique two-out-edge corner counts it exactly once. The intersect
    * is the native merge-scan expression (SortedLongIntersectSize),
    * O(|nu|+|nv|) per edge, zero allocation. Same value as [[count]]
    * (pinned in TrianglesSpec) with no wedge-sized shuffle.
    */
  def countAdjacency(oriented: DataFrame): DataFrame = {
    graft.functions.expressions.SortedLongIntersectSize
      .register(oriented.sparkSession)
    withNeighborArrays(oriented)
      .select(expr("graft_sorted_long_intersect_size(nu, nv)")
        .cast("long").as("c"))
      .agg(coalesce(sum(col("c")), lit(0L)).as("triangles"))
  }

  /** [[perNode]] via adjacency intersection: per edge (u,v) with
    * t = |N⁺(u) ∩ N⁺(v)| > 0, credit u and v with t and every member
    * of the intersection with 1 — one projection emits all three
    * credit kinds, so only credit rows (3 × #triangles, vs Σ outdeg²
    * wedges) reach the per-node aggregate.
    */
  def perNodeAdjacency(oriented: DataFrame): DataFrame =
    creditRows(withNeighborArrays(oriented))
      .groupBy("node")
      .agg(sum(col("c")).as("tri_cnt"))

  /** Per edge (u,v) with t = |N⁺(u) ∩ N⁺(v)| > 0: credit u and v with
    * t and every member of the intersection with 1 — one projection
    * emits all three credit kinds, so only credit rows (3×#triangles)
    * reach the per-node aggregate. Shared by the single-pass and
    * batched per-node paths.
    */
  private def creditRows(wide: DataFrame): DataFrame = {
    val inter = array_intersect(col("nu"), col("nv"))
    wide.select(explode(concat(
        array(struct(col("u").as("node"), size(inter).cast("long").as("c")),
              struct(col("v").as("node"), size(inter).cast("long").as("c"))),
        transform(inter, w =>
          struct(w.as("node"), lit(1L).as("c"))))).as("cr"))
      .select(col("cr.node").as("node"), col("cr.c").as("c"))
      .where(col("c") > 0)
  }

  /** [[perNodeAdjacency]] with a WORKING-SET bound: when the wedge
    * census (Σ outdeg² — the elements the second array-attach join
    * must exchange, see [[attachArrays]]) exceeds `budgetElems`, the
    * edge list is processed in B = ⌈Σ/budget⌉ hash slices, each
    * slice's node-grain partial credits eagerly materialized
    * (localCheckpoint) before the next slice starts, and the partials
    * re-aggregated. At most ONE slice's wide rows are ever resident,
    * so the exchange + hash-join traffic stays inside the page cache
    * instead of thrashing it — the r14 sf10 RAM cliff (~200 GB
    * working set vs 128 GiB, 401.8 s) was exactly this. Slicing is
    * exact: per-edge credits are independent, so any partition of the
    * edge set sums to the same per-node totals (pinned equal to the
    * single-pass path in TrianglesSpec).
    *
    * Below `budgetElems` (every SF this repo benches except sf10)
    * B = 1 and the plan is [[perNodeAdjacency]]'s, unchanged. The
    * census itself is one narrow aggregate over the checkpointed edge
    * list. TWO knobs, both MEASURED on this box (r16, 128 GiB / 32
    * threads, 48 g heap), not guessed:
    *  - `budgetElems` = 5 G: the fits-in-memory ACTIVATION bound.
    *    Slicing below it only costs: at sf3 (Σ outdeg² = 4.23 G)
    *    B = 3 measured 104.2 s vs 84.9 s single-pass — each slice
    *    re-pays an adjacency hash-build, so a workload that fits must
    *    not slice.
    *  - `sliceElems` = 1.5 G: the slice size ONCE slicing is on.
    *    Above the bound, SMALL slices win: at sf10 (14.1 G) B = 10
    *    measured 252.3 s vs B = 3 (≈40 GB slices) 359.6 s vs
    *    unsliced 401.8 s — a 40 GB slice's exchange + hash tables
    *    still thrash the page cache, exactly what slicing exists to
    *    prevent.
    * On a cluster, scale BOTH with aggregate executor memory (the
    * bound keeps per-executor shuffle fetches ∝ slice size).
    */
  def perNodeAdjacencyBatched(oriented: DataFrame,
                              budgetElems: Long = 5000000000L,
                              sliceElems: Long = 1500000000L): DataFrame = {
    val e64 = oriented
      .select(col("u").cast("long").as("u"), col("v").cast("long").as("v"))
      .localCheckpoint(false)
    // census + id-range in ONE narrow pass over the checkpointed edges:
    // Σ outdeg² drives the slicing decision; the id range decides the
    // INTERNAL width. Every element of the wedge-sized exchange (the
    // second array-attach join's wide rows — THE working set this
    // operator exists to bound) is a node id, so ids that fit in int
    // halve its bytes: same element budgets, half the RAM and page-
    // cache traffic per slice. The guard is exact — a single
    // out-of-range id keeps the long path — and the credit values are
    // unaffected (array_intersect/credits are type-generic; the
    // output casts back to long).
    val od = e64.groupBy(col("u"))
      .agg(org.apache.spark.sql.functions.count(lit(1)).as("od"))
    // census (Σ outdeg²) and id range in ONE driver action (r20): the
    // two 1-row aggregates cross-join into a single 4-column row, so
    // the checkpointed edge list is read once and the driver blocks
    // once instead of twice per invocation
    val censusRow = od.agg(sum(col("od") * col("od")).as("s2"))
      .crossJoin(e64.agg(
        min(least(col("u"), col("v"))).as("lo"),
        max(greatest(col("u"), col("v"))).as("hi")))
      .head()
    val s = if (censusRow.isNullAt(0)) 0L else censusRow.getLong(0)
    val fitsInt = !censusRow.isNullAt(1) &&
      censusRow.getLong(1) >= Int.MinValue.toLong &&
      censusRow.getLong(2) <= Int.MaxValue.toLong
    val e = if (fitsInt)
      e64.select(col("u").cast("int").as("u"), col("v").cast("int").as("v"))
    else e64
    // activation vs slice size are separate knobs (see scaladoc): a
    // workload under budget never slices; one over it slices SMALL
    val b = if (s <= budgetElems) 1
            else math.min(64L, (s + sliceElems - 1) / sliceElems).toInt
    val adjOf = e.groupBy(col("u"))
      .agg(sort_array(collect_list(col("v"))).as("nbrs"))
    def finish(credits: DataFrame): DataFrame =
      credits.groupBy("node").agg(sum(col("c")).as("tri_cnt"))
        .select(col("node").cast("long").as("node"), col("tri_cnt"))
    if (b <= 1)
      finish(creditRows(attachArrays(e, adjOf)))
    else {
      // adjacency built ONCE and materialized — each slice re-joins
      // it (edge-sized: Σ outdeg = m elements) instead of re-running
      // the collect_list aggregate B times
      val adj = adjOf.localCheckpoint()
      val partials = (0 until b).map { i =>
        val slice = e.where(
          pmod(xxhash64(col("u"), col("v")), lit(b.toLong)) === i.toLong)
        // localCheckpoint is EAGER: slice i's wide rows are drained
        // to a node-grain partial before slice i+1 allocates anything
        creditRows(attachArrays(slice, adj))
          .groupBy("node").agg(sum(col("c")).as("c"))
          .localCheckpoint()
      }
      finish(partials.reduce(_ union _))
    }
  }
}
