package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private lazy val corpus = Similarity.prep(
    graft.Tables.t(spark, sf("sf0.001"), "embeddings"),
    "vec_id", "embedding", Some("label")).cache()

  test("hyperplanes are deterministic ±1 and stable across calls") {
    val a = Similarity.hyperplanes(4, 8)
    val b = Similarity.hyperplanes(4, 8)
    assert(a === b)
    assert(a.flatten.forall(x => x == 1L || x == -1L))
  }

  test("srpTopK returns a subset of brute-force ranks for each query " +
       "(bucketed candidates score identically)") {
    val queries = corpus.where(col("id") < 3)
    val planes = Similarity.hyperplanes(8, 64)
    val brute = Similarity.cosineTopK(queries, corpus, 500)
      .select("query_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
      .map { case (q, v, c) => (q, v) -> c }.toMap
    val bucketed = Similarity.srpTopK(queries, corpus, 5, planes)
      .select("query_id", "vec_id", "cos")
      .as[(Long, Long, Double)].collect()
    assert(bucketed.nonEmpty)
    bucketed.foreach { case (q, v, c) =>
      assert(brute((q, v)) === c) // same exact cosine as the full scan
    }
  }

  test("CentroidAggregator: exact per-cell centroid of quantized vectors") {
    val df = Seq(
      (0, Seq(1000L, 2000L)), (0, Seq(3000L, 4000L)),
      (1, Seq(500L, 500L))
    ).toDF("cell", "v")
    val got = Centroids.perCell(df, dim = 2)
      .as[(Int, Seq[Double])].collect().toMap
    assert(got(0) === Seq(2.0, 3.0))
    assert(got(1) === Seq(0.5, 0.5))
  }
}
