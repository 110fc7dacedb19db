package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Pins the slicing exactness claims of CommonNeighbors.cappedTopK:
  * (u,v) groups partition by u-slice, per-slice top-k contains every
  * global top-k row of its slice, so forced slicing must reproduce
  * the single-pass answer row for row — including the order-defining
  * jaccard ties broken by (u, v).
  */
class CommonNeighborsSpec extends SparkSpec {
  import spark.implicits._

  private def graph() = {
    // deterministic multigraph on 40 nodes: node i is adjacent (via
    // shared middles) to a hash-driven subset, producing a spread of
    // common-neighbor counts with real jaccard ties
    val edges = (0L until 400L).map { i =>
      val a = (i * 2654435761L) % 40
      val b = (i * 40503L + 7) % 40
      (math.min(a, b), math.max(a, b))
    }.filter { case (a, b) => a != b }.distinct
    val canon = edges.toDF("u", "v").localCheckpoint()
    val deg = Triangles.degrees(canon).localCheckpoint()
    val adj = canon.select(col("u").as("node"), col("v").as("nbr"))
      .union(canon.select(col("v").as("node"), col("u").as("nbr")))
      .localCheckpoint()
    (adj, deg)
  }

  test("forced slicing reproduces the single-pass top-k exactly") {
    val (adj, deg) = graph()
    val single = CommonNeighbors.cappedTopK(adj, deg, cap = Long.MaxValue,
      minCommon = 2L, k = 25).collect()
    // activation 1 forces B = ceil(census / sliceElems) slices
    val sliced = CommonNeighbors.cappedTopK(adj, deg, cap = Long.MaxValue,
      minCommon = 2L, k = 25, activationElems = 1L, sliceElems = 50L).collect()
    assert(single.length > 0, "test graph produced no qualifying pairs")
    assert(sliced.toSeq == single.toSeq,
      "sliced top-k diverged from single-pass")
  }

  test("below the activation bound the result is the plain wedge top-k " +
       "(and k truncates deterministically)") {
    val (adj, deg) = graph()
    val all = CommonNeighbors.cappedTopK(adj, deg, cap = Long.MaxValue,
      minCommon = 2L, k = 1000000).collect()
    val top5 = CommonNeighbors.cappedTopK(adj, deg, cap = Long.MaxValue,
      minCommon = 2L, k = 5).collect()
    assert(top5.toSeq == all.toSeq.take(5),
      "k must truncate the same (jaccard desc, u, v) total order")
  }
}
