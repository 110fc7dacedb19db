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
    // edge list materialized ONCE (r20): un-checkpointed, the
    // upstream edge build re-executed for every consumer — the node
    // union scanned it twice, the degree aggregate and the
    // degree-attach join once each (4 executions of e.g. a
    // lineitem ⋈ orders build). One explode-aggregate then yields
    // node set, out-degrees AND the dangling flag in a single
    // edge-sized shuffle — the old shape paid a union-distinct
    // shuffle plus a node-sized left join for the same frames.
    val e = edges.select(col(src).as("src"), col(dst).as("dst"))
      .localCheckpoint(false)
    val perNode = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("c")),
        struct(col("dst").as("node"), lit(0L).as("c")))).as("x"))
      .select(col("x.node").as("node"), col("x.c").as("c"))
      .groupBy("node").agg(sum(col("c")).as("__outdeg"))
      .localCheckpoint(false) // feeds the dangling tag AND the degrees
    // dangling flag carried through every iteration's rank frame — the
    // per-iteration dangling-mass sum is then a pure map-side
    // aggregate over ranks, not a node-sized semi-join shuffle per
    // round
    val nodesTag = perNode
      .select(col("node"), (col("__outdeg") === 0L).as("__dang"))
      .localCheckpoint(false)
    val n = nodesTag.count()
    if (n == 0)
      return nodesTag.select(col("node")).withColumn("rank", lit(0.0))
    val outDeg = perNode.where(col("__outdeg") > 0)
      .select(col("node").as("src"), col("__outdeg").as("__deg"))
    val edgesDeg = e.join(outDeg, "src")
      .localCheckpoint(false) // the per-iteration join probe side
    var ranks = nodesTag.withColumn("rank", lit(1.0 / n))
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
        .agg(coalesce(sum(when(col("__dang"), col("rank"))), lit(0.0))
          .as("__dm"))
      ranks = nodesTag.join(inMass, Seq("node"), "left")
        .crossJoin(dangling) // single row → broadcast
        .select(col("node"), col("__dang"),
                (lit((1.0 - damping) / n) +
                  lit(damping) *
                    (coalesce(col("__m"), lit(0.0)) + col("__dm") / n))
                  .as("rank"))
        // cut the iteration's lineage + carried-stats growth
      ranks = Materialize(ranks, eager = false)
    }
    ranks.select(col("node"), col("rank"))
  }

  /** Fixed-point PageRank: ranks are scaled integers (`rank_fp` ≈
    * rank × `scale`) and every per-iteration step — the out-degree
    * split, the damping factor, the dangling redistribution — is exact
    * integer arithmetic (`div` truncation, matching SQL `//` on
    * non-negative operands). Integer sums are associative and
    * commutative, so the result is independent of shuffle order and
    * hash-comparable against a DuckDB mirror of the same recurrence,
    * unlike [[run]]'s doubles. Identical join/agg shape and scale
    * properties: the edge+degree probe side is checkpointed once, the
    * dangling mass folds in as a 1-row broadcast aggregate, no driver
    * action inside the loop.
    *
    * Overflow headroom: total rank stays ≤ `scale` (1e12 default), so
    * `dampNum × (inMass + dangling)` ≤ ~2e14 — far inside Long.
    */
  def runFixed(edges: DataFrame, iters: Int,
               scale: Long = 1000000000000L,
               dampNum: Long = 85, dampDen: Long = 100,
               src: String = "src", dst: String = "dst"): DataFrame = {
    require(iters >= 0, s"iters must be >= 0: $iters")
    require(dampNum >= 0 && dampNum <= dampDen && scale > 0)
    // single-materialization setup — see [[run]]'s r20 note: one
    // checkpointed edge list, one explode-aggregate for node set +
    // out-degrees + dangling flag (the old shape re-executed the
    // upstream edge build 4x and paid a union-distinct shuffle plus a
    // node-sized left join for the same frames)
    val e = edges.select(col(src).cast("long").as("src"),
                         col(dst).cast("long").as("dst"))
      .localCheckpoint(false)
    val perNode = e.select(explode(array(
        struct(col("src").as("node"), lit(1L).as("c")),
        struct(col("dst").as("node"), lit(0L).as("c")))).as("x"))
      .select(col("x.node").as("node"), col("x.c").as("c"))
      .groupBy("node").agg(sum(col("c")).as("__outdeg"))
      .localCheckpoint(false) // feeds the dangling tag AND the degrees
    val nodesTag = perNode
      .select(col("node"), (col("__outdeg") === 0L).as("__dang"))
      .localCheckpoint(false)
    val n = nodesTag.count()
    if (n == 0)
      return nodesTag.select(col("node")).withColumn("rank_fp", lit(0L))
    val init = scale / n
    val teleport = ((dampDen - dampNum) * init) / dampDen
    val outDeg = perNode.where(col("__outdeg") > 0)
      .select(col("node").as("src"), col("__outdeg").as("__deg"))
    val edgesDeg = e.join(outDeg, "src").localCheckpoint(false)
    var ranks = nodesTag.withColumn("rank_fp", lit(init))
    for (_ <- 1 to iters) {
      val contribs = edgesDeg
        .join(ranks.withColumnRenamed("node", "src"), "src")
        .select(col("dst").as("node"),
                expr("rank_fp div __deg").as("__c"))
      val inMass = contribs.groupBy("node").agg(sum(col("__c")).as("__m"))
      val dangling = ranks
        .agg(coalesce(sum(when(col("__dang"), col("rank_fp"))), lit(0L))
          .as("__dm"))
      ranks = nodesTag.join(inMass, Seq("node"), "left")
        .crossJoin(dangling) // single row → broadcast
        .select(col("node"), col("__dang"),
          expr(s"${teleport}L + ($dampNum * (coalesce(__m, 0L) " +
               s"+ __dm div ${n}L)) div $dampDen").as("rank_fp"))
        // cut the iteration's lineage + carried-stats growth
      ranks = Materialize(ranks, eager = false)
    }
    ranks.select(col("node"), col("rank_fp"))
  }
}
