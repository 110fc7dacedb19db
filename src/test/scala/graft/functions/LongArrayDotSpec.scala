package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.GraftFunctions

class LongArrayDotSpec extends SparkSpec {
  import spark.implicits._

  test("graft_qdot matches the higher-order-function formulation") {
    GraftFunctions.register(spark)
    val df = Seq(
      (Seq(1L, 2L, 3L), Seq(4L, 5L, 6L)),
      (Seq(-7L, 0L), Seq(2L, 9L)),
      (Seq.empty[Long], Seq.empty[Long])
    ).toDF("a", "b")
    val got = df.select(
      expr("graft_qdot(a, b)").as("native"),
      VectorFns.qdot(col("a"), col("b")).as("hof"))
      .as[(Long, Long)].collect().toSeq
    assert(got === Seq((32L, 32L), (-14L, -14L), (0L, 0L)))
  }

  test("graft_qdot: null array yields null") {
    GraftFunctions.register(spark)
    val df = Seq((Some(Seq(1L)), Option.empty[Seq[Long]])).toDF("a", "b")
    val got = df.select(expr("graft_qdot(a, b)"))
      .collect().head
    assert(got.isNullAt(0))
  }
}
