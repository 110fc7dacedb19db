package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Triangle counting invariants: known closed-form graphs, robustness
  * to duplicates/loops/arbitrary orientation in the input, and
  * id-orientation vs degree-orientation agreement (the two acyclic
  * orders must count identical triangles).
  */
class TrianglesSpec extends SparkSpec {
  import spark.implicits._

  private def edges(pairs: (Int, Int)*) =
    pairs.toSeq.toDF("u", "v")

  private def triangles(df: org.apache.spark.sql.DataFrame): Long =
    Triangles.count(Triangles.orientById(df)).head().getLong(0)

  private def trianglesByDeg(df: org.apache.spark.sql.DataFrame): Long =
    Triangles.count(Triangles.orientByDegree(df)).head().getLong(0)

  test("closed forms: K4 has 4, K5 has 10, C4 has 0, path has 0") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(triangles(k4) === 4L)
    val k5 = edges((for (i <- 1 to 5; j <- (i + 1) to 5) yield (i, j)): _*)
    assert(triangles(k5) === 10L)
    val c4 = edges((1, 2), (2, 3), (3, 4), (4, 1))
    assert(triangles(c4) === 0L)
    val path = edges((1, 2), (2, 3), (3, 4))
    assert(triangles(path) === 0L)
  }

  test("input noise is canonicalized: duplicates, reversals, self-loops") {
    val noisy = edges((1, 2), (2, 1), (1, 2), (2, 3), (3, 1), (1, 1), (3, 3))
    assert(triangles(noisy) === 1L)
    assert(trianglesByDeg(noisy) === 1L)
  }

  test("degree orientation counts the same as id orientation (testdata graph)") {
    val pp = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val byId = triangles(e)
    assert(byId > 0L)
    assert(trianglesByDeg(e) === byId)
  }

  test("perNode credits every triangle to exactly its three corners") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    // K4: each node sits in C(3,2)=3 triangles
    val pn = Triangles.perNode(Triangles.orientById(k4))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(pn === Map(1 -> 3L, 2 -> 3L, 3 -> 3L, 4 -> 3L))
    // testdata graph: per-node credits sum to 3 x total count,
    // independent of orientation
    val pp = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val total = triangles(e)
    val credited = Triangles.perNode(Triangles.orientByDegree(e))
      .agg(sum(col("tri_cnt"))).head().getLong(0)
    assert(credited === 3 * total)
  }

  test("adjacency-intersection count equals the wedge-join count on " +
       "closed forms and the testdata graph") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    assert(Triangles.countAdjacency(Triangles.orientById(k4))
      .head().getLong(0) === 4L)
    val c4 = edges((1, 2), (2, 3), (3, 4), (4, 1))
    assert(Triangles.countAdjacency(Triangles.orientById(c4))
      .head().getLong(0) === 0L)
    val pp = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val wedge = triangles(e)
    assert(Triangles.countAdjacency(Triangles.orientByDegree(e))
      .head().getLong(0) === wedge)
    assert(Triangles.countAdjacency(Triangles.orientById(e))
      .head().getLong(0) === wedge)
  }

  test("perNodeAdjacency equals perNode per node (both orientations)") {
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val pn = Triangles.perNodeAdjacency(Triangles.orientById(k4))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(pn === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val pp = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val oriented = Triangles.orientByDegree(e)
    val viaWedge = Triangles.perNode(oriented)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaAdj = Triangles.perNodeAdjacency(oriented)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAdj === viaWedge)
  }

  test("perNodeAdjacencyBatched equals the single-pass path, forced " +
       "into many slices AND at the B=1 default") {
    // budgetElems=1 forces B = min(64, Σ outdeg²) slices — most empty
    // on a small graph, which also exercises the empty-slice path.
    // Slicing must be exact: per-edge credits are independent, so any
    // partition of the edge set sums to the same per-node totals.
    val k4 = edges((1, 2), (1, 3), (1, 4), (2, 3), (2, 4), (3, 4))
    val batched = Triangles.perNodeAdjacencyBatched(
        Triangles.orientById(k4), budgetElems = 1L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(batched === Map(1L -> 3L, 2L -> 3L, 3L -> 3L, 4L -> 3L))
    val pp = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
      .select(col("l_orderkey").as("ok"), col("l_partkey").as("pk"))
      .distinct()
    val e = pp.as("a")
      .join(pp.as("b"), col("a.ok") === col("b.ok") && col("a.pk") < col("b.pk"))
      .select(col("a.pk").as("u"), col("b.pk").as("v"))
    val oriented = Triangles.orientByDegree(e)
    val single = Triangles.perNodeAdjacency(oriented)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val sliced = Triangles.perNodeAdjacencyBatched(oriented,
        budgetElems = 10000L) // testdata graph: forces several slices
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(sliced === single)
    val b1 = Triangles.perNodeAdjacencyBatched(oriented) // default: B=1
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(b1 === single)
  }

  test("degree orientation emits each canonical edge exactly once") {
    val star = edges((1, 2), (1, 3), (1, 4), (2, 3))
    val oriented = Triangles.orientByDegree(star)
    assert(oriented.count() === 4L)
    // hub 1 (deg 3) must be the TARGET of its star edges
    val intoHub = oriented.where(col("v") === 1).count()
    assert(intoHub === 3L)
  }
}
