package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class KTrussSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Int, Int)*): DataFrame =
    Triangles.orientById(pairs.toDF("u", "v")
      .select(col("u").cast("long"), col("v").cast("long")))

  private def truss(e: DataFrame, k: Int): Set[(Long, Long)] =
    KTruss.edges(e, k).as[(Long, Long)].collect().toSet

  test("closed forms: K5 is a 5-truss, loses everything at k=6; a " +
       "triangle is a 3-truss; a star has no 3-truss") {
    val k5 = edges((for (i <- 0 until 5; j <- i + 1 until 5)
      yield (i, j)): _*)
    assert(truss(k5, 5).size === 10, "every K5 edge closes 3 triangles")
    assert(truss(k5, 6) === Set.empty)
    val tri = edges((0, 1), (1, 2), (0, 2))
    assert(truss(tri, 3).size === 3)
    val star = edges((1 to 5).map(i => (0, i)): _*)
    assert(truss(star, 3) === Set.empty,
      "high degree without triangles must not survive (the k-core " +
        "counter-example)")
  }

  test("peeling cascades: a triangle chained to a K4 keeps only the " +
       "K4 at k=4 (the bridge triangle unravels after its support " +
       "edge falls)") {
    // K4 on {0,1,2,3}; triangle {3,4,5} hangs off node 3 — its edges
    // have support 1, below k-2=2, and removing them must not drag
    // K4 edges (each K4 edge has support 2 within K4 alone)
    val g = edges((0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3),
      (3, 4), (3, 5), (4, 5))
    val k4edges = Set((0L, 1L), (0L, 2L), (0L, 3L), (1L, 2L), (1L, 3L),
      (2L, 3L))
    assert(truss(g, 4) === k4edges)
  }

  test("agrees with a sequential reference peel on the sf0.001 " +
       "co-purchase graph for k = 3 and 4") {
    val pp = graft.Tables.t(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = Triangles.orientById(
      pp.as("a").join(pp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")))
    val pairs = e.as[(Long, Long)].collect()
    def referencePeel(k: Int): Set[(Long, Long)] = {
      var es = pairs.toSet
      var changed = true
      while (changed) {
        val nbrs = scala.collection.mutable.Map
          .empty[Long, Set[Long]].withDefaultValue(Set.empty)
        es.foreach { case (u, v) =>
          nbrs(u) = nbrs(u) + v; nbrs(v) = nbrs(v) + u
        }
        val keep = es.filter { case (u, v) =>
          (nbrs(u) intersect nbrs(v)).size >= k - 2
        }
        changed = keep.size != es.size
        es = keep
      }
      es
    }
    for (k <- Seq(3, 4))
      assert(truss(e, k) === referencePeel(k), s"k=$k")
  }

  test("trussness equals the per-k full peels (incremental ≡ from-" +
       "scratch) and caps at maxK") {
    // K5 with a pendant triangle and a dangling edge: trussness must
    // be 5 on K5 edges, 3 on the pendant triangle, 2 on the bridge
    // and dangling edge
    val g = edges((0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (1, 3),
      (1, 4), (2, 3), (2, 4), (3, 4), // K5
      (4, 5), (5, 6), (4, 6),         // pendant triangle sharing node 4
      (6, 7))                         // dangling edge
    val got = KTruss.trussness(g, 8)
      .as[(Long, Long, Int)].collect()
      .map { case (u, v, t) => (u, v) -> t }.toMap
    // incremental decomposition must agree with independent full peels
    val full = (3 to 8).map(k => k -> truss(g, k)).toMap
    got.foreach { case (e, t) =>
      val expect = (3 to 8).filter(k => full(k).contains(e))
        .lastOption.getOrElse(2)
      assert(t === expect, s"edge $e")
    }
    assert(got(0L -> 1L) === 5 && got(4L -> 5L) === 3 && got(6L -> 7L) === 2)
    // cap: with maxK = 4 the K5 edges report 4
    val capped = KTruss.trussness(g, 4)
      .as[(Long, Long, Int)].collect()
      .map { case (u, v, t) => (u, v) -> t }.toMap
    assert(capped(0L -> 1L) === 4 && capped(4L -> 5L) === 3)
    // every input edge appears exactly once
    assert(got.size === 14 && capped.size === 14)
  }

  test("trusses nest and sit inside the corresponding core: every " +
       "k-truss node is in the (k-1)-core") {
    val pp = graft.Tables.t(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = Triangles.orientById(
      pp.as("a").join(pp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")))
      .localCheckpoint()
    val t3 = truss(e, 3)
    val t4 = truss(e, 4)
    assert(t4.subsetOf(t3), "trusses must nest")
    val t4nodes = t4.flatMap(p => Seq(p._1, p._2))
    val core3 = KCore.nodes(e, 3).as[Long].collect().toSet
    assert(t4nodes.subsetOf(core3),
      "k-truss nodes must lie in the (k-1)-core (Cohen 2008)")
  }
}
