package graft.operators

import scala.util.Random

import graft.SparkSpec

/** PageRank is property-tested (doubles sum in shuffle order, so no
  * SQL-oracle hash): known fixed points, mass conservation, and
  * agreement with an independent driver-side reference implementation
  * of the same recurrence.
  */
class PageRankSpec extends SparkSpec {
  import spark.implicits._

  /** Driver-side reference: dense power iteration with uniform
    * dangling redistribution — the textbook recurrence, no Spark.
    */
  private def reference(edges: Seq[(Long, Long)], iters: Int,
                        damping: Double): Map[Long, Double] = {
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
    val n = nodes.size
    val out = edges.groupBy(_._1).view.mapValues(_.size).toMap
    var rank = nodes.map(_ -> 1.0 / n).toMap
    for (_ <- 1 to iters) {
      val dangling = nodes.filterNot(out.contains).map(rank).sum
      val base = (1.0 - damping) / n + damping * dangling / n
      val in = edges.groupBy(_._2).view.mapValues { es =>
        es.map(e => rank(e._1) / out(e._1)).sum
      }.toMap
      rank = nodes.map(v => v -> (base + damping * in.getOrElse(v, 0.0))).toMap
    }
    rank
  }

  test("uniform rank is the fixed point of a directed cycle") {
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 1L))
    val got = PageRank.run(edges.toDF("src", "dst"), iters = 5)
      .as[(Long, Double)].collect().toMap
    got.values.foreach(r => assert(math.abs(r - 1.0 / 3) < 1e-12))
  }

  test("ranks always sum to 1 (dangling mass is redistributed)") {
    // bipartite: sinks receive everything and have no out-edges
    val edges = Seq((1L, 10L), (2L, 10L), (3L, 11L), (1L, 11L))
    val ranks = PageRank.run(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Double)].collect()
    assert(math.abs(ranks.map(_._2).sum - 1.0) < 1e-9)
  }

  test("fixed-point variant tracks the double variant and conserves " +
       "total mass up to integer-division rounding") {
    val rng = new Random(48)
    val nodes = 25
    val edges = (for {
      a <- 0 until nodes
      b <- 0 until nodes
      if a != b && rng.nextDouble() < 0.12
    } yield (a.toLong, b.toLong)).distinct
    val scale = 1000000000000L
    val fp = PageRank.runFixed(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Long)].collect().toMap
    val dbl = PageRank.run(edges.toDF("src", "dst"), iters = 4)
      .as[(Long, Double)].collect().toMap
    assert(fp.keySet === dbl.keySet)
    // every div truncation loses < 1 unit; a handful of divisions per
    // node per iteration bounds the drift far below this slack
    fp.foreach { case (v, r) =>
      assert(math.abs(r.toDouble / scale - dbl(v)) < 1e-6,
        s"node=$v fixed=${r.toDouble / scale} double=${dbl(v)}")
    }
    val total = fp.values.sum.toDouble / scale
    assert(total > 0.999 && total <= 1.0 + 1e-9, s"total=$total")
  }

  test("fixed-point variant is bit-identical across runs") {
    val rng = new Random(49)
    val edges = (for {
      a <- 0L until 30L
      b <- 0L until 30L
      if a != b && rng.nextDouble() < 0.1
    } yield (a, b)).distinct
    val a = PageRank.runFixed(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toSet
    val b = PageRank.runFixed(edges.toDF("src", "dst"), iters = 3)
      .as[(Long, Long)].collect().toSet
    assert(a === b)
  }

  test("agrees with the driver-side reference on random graphs") {
    val rng = new Random(47)
    (1 to 3).foreach { round =>
      val nodes = 10 + rng.nextInt(20)
      val edges = (for {
        a <- 0 until nodes
        b <- 0 until nodes
        if a != b && rng.nextDouble() < 0.12
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = PageRank.run(edges.toDF("src", "dst"), iters = 6)
          .as[(Long, Double)].collect().toMap
        val want = reference(edges, iters = 6, damping = 0.85)
        assert(got.keySet === want.keySet, s"round=$round")
        got.foreach { case (v, r) =>
          assert(math.abs(r - want(v)) < 1e-9,
            s"round=$round node=$v got=$r want=${want(v)}")
        }
      }
    }
  }
}
