package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Capped common-neighbor similarity with a WORKING-SET bound — the
  * scale path behind the `graph_common_neighbors_capped` catalog row
  * (the caller owns the middle-degree cap; this operator owns the
  * wedge join's memory).
  *
  * The wedge join's (u,v) aggregate holds ~one hash entry per wedge
  * row (~48 B each): at the sf10 co-purchase graph that is ~1.23 G
  * rows ≈ 59 GB — the same over-RAM band where the clustering-
  * coefficient row measured its page-cache cliff
  * ([[Triangles.perNodeAdjacencyBatched]]). Same measured remedy,
  * adapted to a top-k tail: when the wedge census Σ_nbr c·(c−1)/2
  * exceeds `activationElems`, the probe side is processed in u-hash
  * slices. Slicing is EXACT here twice over: (u,v) groups partition
  * by u (no pair spans two slices), and a per-slice top-k by the
  * total order (jaccard desc, u, v) contains every global top-k row
  * of its slice, so the global top-k over the ≤ k·B union equals the
  * unsliced answer (pinned equal in CommonNeighborsSpec under forced
  * slicing). Each slice eagerly drains (localCheckpoint) before the
  * next allocates, so at most one slice's aggregate is ever resident.
  *
  * Knob defaults follow the Triangles measurements (r16, 128 GiB /
  * 32 threads): activate past ~24 GB of aggregate (5e8 wedge rows),
  * slice at ~12 GB (2.5e8) — below the bound B = 1 and the plan is
  * the plain single-pass wedge join. On a cluster, scale both with
  * aggregate executor memory.
  *
  * The adjacency is checkpointed ONLY on the sliced path: below the
  * bound the wedge join stays fully pipelined with whatever produced
  * `adj` (an unconditional materialization measured 57.5 → 130.9 s
  * at sf3 — the checkpoint's write + lost whole-stage fusion cost
  * more than it saved). The census itself runs on the pipelined
  * frame (one extra narrow pass).
  *
  * @param adj capped adjacency as (node, nbr) — caller applies the
  *            degree cap; do NOT pre-checkpoint (see above)
  * @param deg full degrees as (node, deg) for the Jaccard denominator
  *            (callers checkpoint this node-sized frame already)
  * @param cap the middle-degree cap the caller applied to adj's nbr
  *            side — lets the census run on `deg` instead of `adj`
  */
object CommonNeighbors {
  def cappedTopK(adj: DataFrame, deg: DataFrame, cap: Long,
                 minCommon: Long = 2L, k: Int = 50,
                 activationElems: Long = 500000000L,
                 sliceElems: Long = 250000000L): DataFrame = {
    val wedgeCensus = {
      // Exact, from the NODE-sized deg frame (milliseconds) instead
      // of re-running the edge pipeline adj hangs off (an adj-side
      // census measured +25% on the whole sf3 cell): a capped middle
      // m contributes exactly deg(m) adj rows, so Σ_nbr c·(c−1)/2 =
      // Σ_{deg(m)≤cap} deg(m)·(deg(m)−1)/2. Sum the product, halve
      // in Scala — Spark's `/` is DOUBLE division.
      val r = deg.where(col("deg") <= cap)
        .agg(sum(col("deg").cast("long") * (col("deg") - 1))).head()
      (if (r.isNullAt(0)) 0L else r.getLong(0)) / 2
    }
    val b = if (wedgeCensus <= activationElems) 1
            else math.min(64L,
              (wedgeCensus + sliceElems - 1) / sliceElems).toInt
    def sliceTop(probe: DataFrame, build: DataFrame) =
      probe.as("x")
        .join(build.as("y"),
          col("x.nbr") === col("y.nbr") && col("x.node") < col("y.node"))
        .groupBy(col("x.node").as("u"), col("y.node").as("v"))
        .agg(count(lit(1)).as("common"))
        .where(col("common") >= minCommon)
        .join(deg.select(col("node").as("u"), col("deg").as("du")), "u")
        .join(deg.select(col("node").as("v"), col("deg").as("dv")), "v")
        .select(col("u"), col("v"), col("common"),
          (col("common").cast("double") /
            (col("du") + col("dv") - col("common")).cast("double"))
            .as("jaccard"))
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(k)
    if (b <= 1) sliceTop(adj, adj)
    else {
      // materialize once — every slice re-joins these blocks
      val adjC = adj.localCheckpoint()
      (0 until b).map { i =>
        sliceTop(adjC.where(
            pmod(xxhash64(col("node")), lit(b.toLong)) === i.toLong), adjC)
          .localCheckpoint() // eager: drain slice i before i+1 allocates
      }.reduce(_ union _)
        .orderBy(col("jaccard").desc, col("u"), col("v"))
        .limit(k)
    }
  }
}
