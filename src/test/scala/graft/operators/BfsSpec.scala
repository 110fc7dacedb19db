package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Frontier BFS must produce exactly the textbook shortest
  * hop-distances: checked against a driver-side queue BFS on random
  * directed graphs, plus the maxHops truncation contract.
  */
class BfsSpec extends SparkSpec {
  import spark.implicits._

  private def reference(edges: Seq[(Long, Long)], sources: Set[Long],
                        maxHops: Int): Map[Long, Int] = {
    val adj = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    var dist = sources.map(_ -> 0).toMap
    var frontier = sources
    for (h <- 1 to maxHops) {
      frontier = frontier.flatMap(n => adj.getOrElse(n, Nil))
        .filterNot(dist.contains)
      dist ++= frontier.map(_ -> h)
    }
    dist
  }

  test("matches a driver-side queue BFS on random directed graphs") {
    val rng = new Random(71)
    (1 to 3).foreach { round =>
      val nodes = 15 + rng.nextInt(25)
      val edges = (for {
        a <- 0 until nodes
        b <- 0 until nodes
        if a != b && rng.nextDouble() < 0.08
      } yield (a.toLong, b.toLong)).distinct
      val sources = Set(0L, (nodes / 2).toLong)
      if (edges.nonEmpty) {
        val got = Bfs.distances(edges.toDF("src", "dst"),
            sources.toSeq.toDF("node"), maxHops = 6)
          .as[(Long, Int)].collect().toMap
        assert(got === reference(edges, sources, 6), s"round=$round")
      }
    }
  }

  test("maxHops truncates the wave: a chain stops at the horizon") {
    val chain = (0L until 6L).map(i => (i, i + 1)).toDF("src", "dst")
    val got = Bfs.distances(chain, Seq(0L).toDF("node"), maxHops = 3)
      .as[(Long, Int)].collect().toMap
    assert(got === Map(0L -> 0, 1L -> 1, 2L -> 2, 3L -> 3))
  }
}
