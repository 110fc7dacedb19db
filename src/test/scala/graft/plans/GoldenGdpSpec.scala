package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.{GdpPipeline => P, GdpSchemas => S}

/** Golden end-to-end checks against the reference's committed outputs
  * (CSVs under /root/reference/output, produced by a real 2025-08-29 run).
  * These are the reference's own correctness oracle (SURVEY §5): if a
  * stage reproduces the golden rows exactly, its R semantics are right.
  */
class GoldenGdpSpec extends SparkSpec {
  private val refData = "/root/reference/data"
  private val refOut = "/root/reference/output"

  private lazy val goldenUpdate: DataFrame =
    S.readCsv(spark, s"$refOut/gdp_update.csv", S.gdpUpdate).cache()

  private def diffCount(a: DataFrame, b: DataFrame): (Long, Long) =
    (a.exceptAll(b).count(), b.exceptAll(a).count())

  test("compute_aggregate_values reproduces the 8,052 golden group rows " +
       "from the golden leaf rows") {
    val leaves = goldenUpdate
      .where(length(col("Economy_Code")) < 4)
      .select("Economy_Code", "Economy_Label", "Year", "Variable", "Value")
    val edges = S.readCsv(spark, s"$refData/Dim_Countries_Hierarchy_All.csv",
      S.hierarchy)
    val groups = P.computeAggregateValues(leaves, edges)
      .where(length(col("Economy_Code")) >= 4)
    val goldenGroups = goldenUpdate
      .where(length(col("Economy_Code")) >= 4)
      .select("Economy_Code", "Economy_Label", "Year", "Variable", "Value")
    val (extra, missing) = diffCount(groups, goldenGroups)
    assert(goldenGroups.count() === 8052L)
    assert((extra, missing) === ((0L, 0L)),
      s"group rows diverge: $extra unexpected, $missing missing")
  }

  test("comparison module reproduces golden gdp_comparison.csv " +
       "(modulo the reference's stale 2024-current stratum)") {
    // Reference quirk: the committed gdp_comparison.csv was generated
    // from an EARLIER pipeline run than the committed gdp_update.csv —
    // exactly the 64 (Year=2024, GDP_at_current_prices) rows carry a
    // Value.new inconsistent with gdp_update.csv (live USIS deflator
    // estimates changed between runs; verified independently with
    // DuckDB). Those rows are excluded; everything else must match
    // exactly.
    val labels = S.readCsv(spark, s"$refData/lab_all.csv", S.labels)
    val oldRelease = S.readCsv(spark,
      s"$refData/US.GDPTotal_20250718_104458.csv", S.oldRelease)
    val stale = col("Year") === 2024 &&
      col("Variable") === "GDP_at_current_prices"
    val got = P.comparison(oldRelease, labels, goldenUpdate)
    val want = S.readCsv(spark, s"$refOut/gdp_comparison.csv", S.gdpComparison)
    assert(want.count() === 32912L)
    val (extra, missing) = diffCount(got.where(!stale), want.where(!stale))
    assert((extra, missing) === ((0L, 0L)),
      s"comparison rows diverge: $extra unexpected, $missing missing")
    // the excluded stratum is exactly the documented 64 rows
    val (extraStale, _) = diffCount(got.where(stale), want.where(stale))
    assert(extraStale === 64L)
    assert(got.count() === 32912L)
  }

  test("usis projection reproduces golden gdp_update_usis.csv exactly") {
    val got = P.usisProjection(goldenUpdate, lastYear = 2024,
      refDate = "29-Aug-25")
    val want = S.readCsv(spark, s"$refOut/gdp_update_usis.csv", S.gdpUsis)
    assert(want.count() === 22046L)
    val (extra, missing) = diffCount(got, want)
    assert((extra, missing) === ((0L, 0L)),
      s"usis rows diverge: $extra unexpected, $missing missing")
  }
}
