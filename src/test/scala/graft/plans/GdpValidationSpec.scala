package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.{GdpPipeline => P, GdpSchemas => S, GdpValidation => V}

/** The five chapter validation queries over the real reference data:
  * the comparison of the captured old release vs the golden update.
  * (The chapters print reports rather than committing CSVs, so these
  * assert semantic invariants instead of golden equality.)
  */
class GdpValidationSpec extends SparkSpec {
  private val refData = "/root/reference/data"
  private val refOut = "/root/reference/output"

  private lazy val cmp = {
    val labels = S.readCsv(spark, s"$refData/lab_all.csv", S.labels)
    val oldRelease = S.readCsv(spark,
      s"$refData/US.GDPTotal_20250718_104458.csv", S.oldRelease)
    val newDf = S.readCsv(spark, s"$refOut/gdp_update.csv", S.gdpUpdate)
    P.comparison(oldRelease, labels, newDf).cache()
  }

  test("ch04: discrepancy report excludes the estimated year and " +
       "compresses year runs") {
    val d = V.discrepanciesBeforeLastYear(cmp, lastYear = 2024).cache()
    assert(d.count() > 0)
    // the estimated year never appears in any run string
    assert(d.where(col("Years").contains("2024")).count() === 0)
    // run strings are well-formed (digits, dashes, comma-space)
    assert(d.where(!col("Years").rlike("^[0-9]{4}(-[0-9]{4})?(, [0-9]{4}(-[0-9]{4})?)*$"))
      .count() === 0)
  }

  test("ch05: top revisions are estimated-year rows, ranked by " +
       "magnitude with deterministic tiebreak") {
    val t = V.topRevisionsLastYear(cmp, lastYear = 2024).collect()
    assert(t.length === 19)
    val mags = t.map(_.getAs[Double]("magnitude"))
    assert(mags.zip(mags.tail).forall { case (a, b) => a >= b })
    assert(mags.forall(_ >= 1.0))
  }

  test("ch06/ch07: missing and added value sets are disjoint per " +
       "(economy, variable, year) by construction") {
    val miss = V.missingValues(cmp)
    val added = V.addedValues(cmp)
    // old-not-new and new-not-old both exist in this release pair
    assert(miss.count() > 0)
    assert(added.count() > 0)
  }

  test("ch08: implied deflator self-check — feeding deflators derived " +
       "from the update itself flags zero breaches") {
    val newDf = S.readCsv(spark, s"$refOut/gdp_update.csv", S.gdpUpdate)
    // independent series := the implied deflator itself => Diff == 0
    val selfDeflators = newDf
      .groupBy(col("Economy_Code").as("Country_Code"), col("Year"))
      .pivot(col("Variable"),
        Seq("GDP_at_constant_prices_2015", "GDP_at_current_prices"))
      .agg(first(col("Value")))
      .select(col("Country_Code"), col("Year"),
        (lit(100) * col("GDP_at_current_prices") /
          col("GDP_at_constant_prices_2015")).as("Deflator_USD"))
      .where(col("Deflator_USD").isNotNull)
    val checked = V.deflatorCrossCheck(newDf, selfDeflators).cache()
    assert(checked.count() > 0)
    assert(checked.where(col("breach")).count() === 0)
  }
}
