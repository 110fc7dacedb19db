package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec

class KCoreSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Int, Int)*): DataFrame =
    Triangles.orientById(pairs.toDF("u", "v")
      .select(col("u").cast("long"), col("v").cast("long")))

  private def core(e: DataFrame, k: Int): Set[Long] =
    KCore.nodes(e, k).as[Long].collect().toSet

  test("closed forms: K5 clique is a 4-core, a star is only a 1-core, " +
       "a path peels to nothing at k=2") {
    val k5 = edges((for (i <- 0 until 5; j <- i + 1 until 5)
      yield (i, j)): _*)
    assert(core(k5, 4) === Set(0L, 1L, 2L, 3L, 4L))
    assert(core(k5, 5) === Set.empty)
    val star = edges((1 to 6).map(i => (0, i)): _*)
    assert(core(star, 1) === (0 to 6).map(_.toLong).toSet)
    assert(core(star, 2) === Set.empty)
    val path = edges((0, 1), (1, 2), (2, 3), (3, 4))
    assert(core(path, 2) === Set.empty)
  }

  test("peeling is cascading: a triangle with a pendant chain keeps " +
       "only the triangle at k=2 (the chain unravels link by link)") {
    // triangle {0,1,2} + chain 2-3-4-5: nodes 3,4 have degree 2 until
    // 5 peels, then 4, then 3 — single-round removal would wrongly
    // keep them; the fixpoint must not
    val g = edges((0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5))
    assert(core(g, 2) === Set(0L, 1L, 2L))
  }

  test("agrees with a sequential reference peel on the sf0.001 " +
       "co-purchase graph for k = 2 and 3") {
    val pp = graft.Tables.t(spark, sf("sf0.001"), "lineitem")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = Triangles.orientById(
      pp.as("a").join(pp.as("b"),
        col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
        .select(col("a.pk").as("u"), col("b.pk").as("v")))
    val pairs = e.as[(Long, Long)].collect()
    def referencePeel(k: Int): Set[Long] = {
      var es = pairs.toSet
      var changed = true
      while (changed) {
        val deg = es.toSeq.flatMap(p => Seq(p._1, p._2))
          .groupBy(identity).map { case (n, xs) => n -> xs.size }
        val keep = deg.collect { case (n, d) if d >= k => n }.toSet
        val next = es.filter(p => keep(p._1) && keep(p._2))
        changed = next.size != es.size
        es = next
      }
      es.flatMap(p => Seq(p._1, p._2))
    }
    for (k <- Seq(2, 3))
      assert(core(e, k) === referencePeel(k), s"k=$k")
  }

  test("coreness levels nest: every (k+1)-core node is a k-core node, " +
       "and coreness matches membership") {
    val g = edges((0, 1), (1, 2), (0, 2), (2, 3), (3, 4), (4, 5),
      (3, 5), (5, 6))
    val byK = (1 to 3).map(k => k -> core(g, k)).toMap
    assert(byK(2).subsetOf(byK(1)) && byK(3).subsetOf(byK(2)))
    val cn = KCore.coreness(g, 3).as[(Long, Int)].collect().toMap
    cn.foreach { case (node, c) =>
      (1 to 3).foreach { k =>
        assert(byK(k).contains(node) === (c >= k),
          s"node $node coreness $c vs k=$k membership")
      }
    }
  }
}
