package graft.operators

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** TotalOrder must equal the single-partition window formulation it
  * replaces — rank, running sums, and the SQL NTILE bucket rule —
  * including desc orders, null values in sum columns, and totals.
  */
class TotalOrderSpec extends SparkSpec {

  private def sample = {
    import spark.implicits._
    // unique tiebreak id; values include negatives, dups and a null-ish
    // marker handled via when() at the call sites
    (1 to 997).map(i => (i.toLong, ((i * 7919) % 251).toLong,
        if (i % 13 == 0) null else java.lang.Long.valueOf((i * 31) % 97)))
      .toDF("id", "k", "v")
      .repartition(7)
  }

  test("withRowNumber equals row_number over the global window, asc and desc") {
    val df = sample
    val w = Window.orderBy(col("k"), col("id"))
    val expected = df.withColumn("rn", row_number().over(w).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val got = TotalOrder.withRowNumber(df, Seq(col("k"), col("id")), "rn")
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == expected)

    val wD = Window.orderBy(col("k").desc, col("id").desc)
    val expD = df.withColumn("rn", row_number().over(wD).cast("long"))
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val gotD = TotalOrder.withRowNumber(df,
        Seq(col("k").desc, col("id").desc), "rn")
      .select("id", "rn").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(gotD == expD)
  }

  test("ordered: running sums (null-skipping) + rank + grand totals " +
       "match the window twin") {
    val df = sample
    val w = Window.orderBy(col("k"), col("id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val expected = df
      .withColumn("s1", coalesce(sum(col("v")).over(w), lit(0L)))
      .withColumn("s2", sum(when(col("v").isNull, 1L).otherwise(0L)).over(w))
      .select("id", "s1", "s2").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val ord = TotalOrder.ordered(df, Seq(col("k"), col("id")),
      Seq(col("v") -> "s1",
          when(col("v").isNull, 1L).otherwise(0L) -> "s2"),
      rankOut = Some("rn"))
    val got = ord.df.select("id", "s1", "s2").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    assert(got == expected)
    assert(ord.totalCount == 997L)
    val vSum = df.agg(sum(col("v"))).collect()(0).getLong(0)
    assert(ord.totalSums(0) == vSum)
    assert(ord.totalSums(1) == 997L / 13)
    // ranks form the exact permutation 1..n
    val ranks = ord.df.select("rn").collect().map(_.getLong(0)).sorted.toSeq
    assert(ranks == (1L to 997L))
  }

  test("withNtile matches ntile() for bucket counts that do and do not " +
       "divide the row count") {
    val df = sample
    for (n <- Seq(4, 5, 7, 997, 1500)) {
      val w = Window.orderBy(col("k"), col("id"))
      val expected = df.withColumn("b", ntile(n).over(w))
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      val got = TotalOrder.withNtile(df, Seq(col("k"), col("id")), n, "b")
        .select("id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(got == expected, s"ntile($n) mismatch")
    }
  }

  test("plan shape: no WindowExec anywhere; narrow MapPartitions over " +
       "the checkpointed range layout") {
    val df = TotalOrder.withRowNumber(sample, Seq(col("k"), col("id")), "rn")
    assert(graft.PlanAudit.globalWindowCount(df) == 0)
    val p = df.queryExecution.explainString(
      org.apache.spark.sql.execution.FormattedMode)
    assert(!p.contains("Window"), s"no window may appear:\n$p")
    assert(p.contains("MapPartitions"), s"expected the narrow pass:\n$p")
  }
}
