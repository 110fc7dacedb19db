package graft.operators

import scala.util.Random

import graft.SparkSpec

/** Cross-implementation check: our DataFrame hash-min label
  * propagation must agree with Spark's own GraphX
  * `connectedComponents` (Pregel-based, independently implemented)
  * on random graphs — both canonicalize a component by its minimum
  * vertex id, so the outputs are directly comparable.
  */
class ComponentsSpec extends SparkSpec {
  import spark.implicits._

  test("Components.connected agrees with GraphX connectedComponents " +
       "on random graphs") {
    val rng = new Random(23)
    (1 to 3).foreach { round =>
      val nodes = 20 + rng.nextInt(30)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < (0.04 + 0.02 * round)
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val got = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val graph = org.apache.spark.graphx.Graph.fromEdgeTuples(
          spark.sparkContext.parallelize(edges), defaultValue = 0)
        val want = graph.connectedComponents().vertices.collect().toMap
        assert(got === want, s"round=$round edges=$edges")
      }
    }
  }

  test("connectedAlternating (large-star/small-star) agrees with the " +
       "label propagation on random graphs") {
    val rng = new Random(31)
    (1 to 3).foreach { round =>
      val nodes = 15 + rng.nextInt(25)
      val edges = (for {
        a <- 0 until nodes
        b <- (a + 1) until nodes
        if rng.nextDouble() < 0.07
      } yield (a.toLong, b.toLong)).distinct
      if (edges.nonEmpty) {
        val prop = Components.connected(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        val alt = Components
          .connectedAlternating(edges.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
        assert(alt === prop, s"round=$round edges=$edges")
      }
    }
  }

  test("connectedAlternating covers a 120-node chain in O(log) rounds " +
       "(diameter-independent, unlike plain propagation)") {
    val chain = (0L until 120L).map(i => (i, i + 1))
    val got = Components
      .connectedAlternating(chain.toDF("a", "b"), "a", "b", maxRounds = 12)
      .as[(Long, Long)].collect().toMap
    assert(got.size === 121 && got.values.forall(_ == 0L))
  }

  test("a long chain converges (diameter-bound iterations) and a " +
       "too-small maxIters throws instead of returning wrong labels") {
    // min label travels one hop per iteration: 25 < default maxIters
    val chain = (0L until 25L).map(i => (i, i + 1))
    val got = Components.connected(chain.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    assert(got.size === 26 && got.values.forall(_ == 0L))
    intercept[IllegalStateException] {
      Components.connected(chain.toDF("a", "b"), "a", "b", maxIters = 3)
    }
  }
}
