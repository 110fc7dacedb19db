package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class LabelPropagationSpec extends SparkSpec {
  import spark.implicits._

  private def lpa(edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] =
    LabelPropagation.run(
        Triangles.orientById(edges.toDF("u", "v")), iters)
      .as[(Long, Long)].collect().toMap

  /** Sequential reference: same synchronous min-tie semantics, plain
    * Scala maps — the oracle the distributed rounds must agree with.
    */
  private def reference(edges: Seq[(Long, Long)],
                        iters: Int): Map[Long, Long] = {
    val nbrs = (edges ++ edges.map { case (u, v) => (v, u) })
      .filter { case (u, v) => u != v }.distinct
      .groupMap(_._1)(_._2)
    var labels = nbrs.keys.map(n => n -> n).toMap
    for (_ <- 1 to iters) {
      labels = nbrs.map { case (n, ns) =>
        val counts = ns.groupBy(labels).view.mapValues(_.size)
        // max count, then min label
        n -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    labels
  }

  test("a triangle converges to its minimum member label") {
    val tri = Seq((1L, 2L), (2L, 3L), (1L, 3L),
                  (4L, 5L), (5L, 6L), (4L, 6L))
    val got = lpa(tri, 3)
    assert(got === Map(1L -> 1L, 2L -> 1L, 3L -> 1L,
                       4L -> 4L, 5L -> 4L, 6L -> 4L))
  }

  test("synchronous star oscillation is deterministic and pinned") {
    // K1,4: center 0, leaves 1..4 — the classic bipartite flip-flop.
    // Round parity decides who holds whose label; 4 rounds (even) puts
    // the center back on 0 and the leaves on the min leaf label 1.
    val star = Seq((0L, 1L), (0L, 2L), (0L, 3L), (0L, 4L))
    val got = lpa(star, 4)
    assert(got === Map(0L -> 0L, 1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L))
  }

  test("distributed rounds match the sequential reference on a mixed " +
       "graph, round by round") {
    // two communities joined by one bridge + a pendant node
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L),
                (4L, 5L), (5L, 6L), (4L, 6L), (6L, 7L))
    for (iters <- 1 to 4)
      assert(lpa(g, iters) === reference(g, iters), s"iters=$iters")
  }

  test("query runs on real data and labels every co-purchase node") {
    val q = graft.SparkEntry.queries("graph_label_propagation")
    val df = q(spark, sf("sf0.001"))
    val n = df.count()
    assert(n > 0)
    // one row per node, every label is a node id that exists
    assert(df.select("node").distinct().count() === n)
    val nodes = df.select(col("node")).distinct()
    val orphanLabels = df.select(col("label").as("node"))
      .distinct().except(nodes).count()
    assert(orphanLabels === 0, "labels must be node ids from the graph")
  }
}
