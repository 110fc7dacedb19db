package graft.plans

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.plans.{GdpExtract => E, GdpSchemas => S}

class GdpExtractSpec extends SparkSpec {
  import spark.implicits._

  private lazy val exchangeRates = S.readCsv(spark,
    "/root/reference/data/exchange_rates.csv", S.usisExtract)

  test("gdpDeflators: feeding the same series as deflator and exchange " +
       "rate yields exactly 100 everywhere the 2015 anchor exists") {
    // Deflator_exg = Value/Value = 1 for every row, so the 2015-rebased
    // deflator must be exactly 100 — a fixpoint that exercises the join,
    // the A4 anchor window (length==1 guard) and the na.omit. The CPI
    // fallback branch is fed an empty frame here (it rebases raw CPI
    // levels, so the ratio-of-identical-series identity doesn't apply)
    // and is covered by the synthetic test below.
    val emptyCpi = exchangeRates.where(lit(false))
    val got = E.gdpDeflators(emptyCpi, exchangeRates, exchangeRates,
      lastYear = 2024).cache()
    assert(got.count() > 10000)
    assert(got.where(col("Deflator_USD") =!= 100.0).count() === 0)
    // countries without a single 2015 row are dropped by the guard+na.omit
    val with2015 = exchangeRates.where(col("Year") === 2015 &&
      col("Value").isNotNull).select("Country_Code").distinct()
    val gotCodes = got.select("Country_Code").distinct()
    assert(gotCodes.exceptAll(with2015).count() === 0)
  }

  test("gdpDeflators CPI branch: rebases levels to the 2015 anchor and " +
       "keeps only the estimation year") {
    val cpi = Seq(
      ("004", "Afghanistan", 2015, 80.0),
      ("004", "Afghanistan", 2024, 120.0),
      ("060", "Bermuda", 2024, 99.0), // no 2015 anchor -> dropped
      ("840", "USA", 2024, 100.0)     // not a fallback economy -> dropped
    ).toDF("Country_Code", "Country_Label", "Year", "Value")
    val empty = cpi.where(lit(false))
    val got = E.gdpDeflators(cpi, empty, empty, lastYear = 2024)
      .as[(String, Int, Double)].collect().toSet
    assert(got === Set(("004", 2024, 150.0)))
  }

  test("growthFromWide keeps id + last year column") {
    val wide = Seq(("840", "USA", 1.0, 2.5), ("158", "Taiwan", 2.0, 3.1))
      .toDF("UNCTcc", "Country/Region", "2023", "2024")
    val got = E.growthFromWide(wide).as[(String, Double)].collect().toSet
    assert(got === Set(("840", 2.5), ("158", 3.1)))
  }

  test("unsdWideToLong filters the GDP indicator, unpivots years and " +
       "zero-pads codes") {
    val wide = Seq(
      (4, "Afghanistan", "Gross Domestic Product (GDP)", 10.0, 11.0),
      (4, "Afghanistan", "Exports", 1.0, 2.0))
      .toDF("CountryID", "Country", "IndicatorName", "2020", "2021")
    val got = E.unsdWideToLong(wide, "GDP_at_constant_prices_2015")
      .select("Economy_Code", "Year", "GDP_at_constant_prices_2015")
      .as[(String, Int, Double)].collect().toSet
    assert(got === Set(("004", 2020, 10.0), ("004", 2021, 11.0)))
  }
}
