package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec

class BandJoinRuleSpec extends SparkSpec {
  import spark.implicits._

  private def withRule[T](f: => T): T = {
    val prev = spark.experimental.extraOptimizations
    spark.experimental.extraOptimizations = prev :+ BandJoinRule
    try f finally spark.experimental.extraOptimizations = prev
  }

  test("band join rewrites to a hash-partitionable equi-join with the " +
       "exact nested-loop result") {
    val l = (0L until 300L).map(i => (i, i * 37 % 997)).toDF("lid", "lt")
    val r = (0L until 300L).map(i => (i, i * 61 % 997)).toDF("rid", "rt")
    val cond = abs(col("lt") - col("rt")) <= lit(3L)

    val naive = l.join(r, cond).select("lid", "rid")
      .as[(Long, Long)].collect().toSet
    assert(naive.nonEmpty)

    withRule {
      val joined = l.join(r, cond)
      val planStr = joined.queryExecution.executedPlan.toString
      assert(!planStr.contains("NestedLoop"),
        s"band join should not plan as a nested loop:\n$planStr")
      val got = joined.select("lid", "rid").as[(Long, Long)].collect().toSet
      assert(got === naive)
    }
  }

  test("rule leaves joins with an equi-key alone") {
    val l = Seq((1L, 10L), (2L, 20L)).toDF("k", "lt")
    val r = Seq((1L, 11L), (2L, 99L)).toDF("k2", "rt")
    withRule {
      val joined = l.join(r,
        col("k") === col("k2") && abs(col("lt") - col("rt")) <= lit(5L))
      assert(joined.select("k").as[Long].collect().toSeq === Seq(1L))
      val planStr = joined.queryExecution.optimizedPlan.toString
      assert(!planStr.contains("__lband"), s"should not rewrite:\n$planStr")
    }
  }

  test("rewritten plan still matches DuckDB-oracle semantics on the " +
       "events range join shape (ints in microseconds)") {
    // same shape as events_range_join but WITHOUT the user_id equi-key:
    // all click/purchase pairs within 5 seconds, keys in micros.
    val clicks = (0L until 150L).map(i => (i, i * 777_000L % 60_000_000L))
      .toDF("cid", "cus")
    val purchases = (0L until 150L).map(i => (i, i * 991_000L % 60_000_000L))
      .toDF("pid", "pus")
    val cond = abs(col("cus") - col("pus")) <= lit(5_000_000L)
    val naive = clicks.join(purchases, cond).select("cid", "pid")
      .as[(Long, Long)].collect().toSet
    withRule {
      val got = clicks.join(purchases, cond).select("cid", "pid")
        .as[(Long, Long)].collect().toSet
      assert(got === naive)
    }
  }
}
