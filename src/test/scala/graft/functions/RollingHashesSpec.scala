package graft.functions

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.functions.expressions.RollingHashes

class RollingHashesSpec extends SparkSpec {
  import spark.implicits._

  private val (w, b, m) = (5, 31, 1099511627689L)

  private def direct(s: String): Seq[Long] =
    (w to s.length).map { i =>
      (0 until w).map { j =>
        (s.charAt(i - 1 - j) + 1L) *
          Iterator.iterate(1L)(_ * b % m).drop(j).next() % m
      }.sum % m
    }

  test("rolling form equals the direct windowed-sum definition") {
    val texts = Seq("", "abc", "abcde", "the quick brown fox", "aaaaaaa")
    RollingHashes.register(spark)
    val got = texts.toDF("t")
      .select(expr(s"graft_rolling_hashes(t, $w, $b, ${m}L)"))
      .as[Seq[Long]].collect()
    texts.zip(got).foreach { case (t, g) =>
      assert(g === direct(t), s"text: '$t'")
    }
  }

  test("identical spans hash identically wherever they appear") {
    RollingHashes.register(spark)
    val Seq(h1, h2) = Seq("XXjumped overXX", "YYYjumped overY")
      .toDF("t")
      .select(expr(s"graft_rolling_hashes(t, $w, $b, ${m}L)"))
      .as[Seq[Long]].collect().toSeq
    // 'jumped over' occupies 1-based positions 3..13 in the first and
    // 4..14 in the second; spans fully inside it end at i = 7..13 vs
    // 8..14, i.e. array indices (i − w) 2..8 vs 3..9
    assert(h1.slice(2, 9) === h2.slice(3, 10))
  }

  test("the expression is codegen'd inside the query plan") {
    RollingHashes.register(spark)
    val df = Seq("hello world").toDF("t")
      .select(expr(s"graft_rolling_hashes(t, $w, $b, ${m}L)").as("h"))
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("WholeStageCodegen") ||
      !plan.contains("graft_rolling_hashes"), plan)
    assert(df.as[Seq[Long]].head().nonEmpty)
  }
}
