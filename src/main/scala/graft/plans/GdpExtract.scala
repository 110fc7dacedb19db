package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Extract-stage transforms (`gpd_etl_pipeline.R:41-147, 223-273`).
  * Network fetches (USIS OData / UNSD xlsx / Taiwan NSO) are behind
  * the caller: every function here takes already-staged DataFrames in
  * the captured shapes (`GdpSchemas.usisExtract`, the wide growth
  * matrix), so the whole transform layer is testable offline against
  * `/root/reference/data`.
  */
object GdpExtract {

  /** Economies whose deflator comes from rebased CPI
    * (`gpd_etl_pipeline.R:225-228`).
    */
  val cpiFallbackEconomies: Seq[String] = Seq(
    "004", "060", "092", "136", "184", "192", "232", "258", "275", "304",
    "500", "531", "534", "540", "660", "760", "796")

  /** The reference's group-broadcast anchor (SURVEY §2.5 A4): the 2015
    * value attached to every row of the group, with R's length==1
    * guard — exactly one 2015 row, else null. Groups follow the
    * reference (Country_Label).
    */
  private def anchor2015(value: org.apache.spark.sql.Column) = {
    val w = Window.partitionBy(col("Country_Label"))
    when(count(when(col("Year") === 2015, lit(1))).over(w) === 1,
      max(when(col("Year") === 2015, value)).over(w))
  }

  /** `get_gdp_deflators` (`gpd_etl_pipeline.R:223-273`): CPI-rebase
    * fallback for the listed economies (at `lastYear` only) unioned
    * with exchange-rate-adjusted deflators rebased to 2015; fully-null
    * rows dropped (R `na.omit`).
    */
  def gdpDeflators(cpi: DataFrame, exchangeRates: DataFrame,
                   deflatorSeries: DataFrame, lastYear: Int): DataFrame = {
    val cpiPart = cpi
      .select(col("Country_Code"), col("Country_Label"), col("Year"), col("Value"))
      .where(col("Country_Code").isin(cpiFallbackEconomies: _*))
      .withColumn("Value2015", anchor2015(col("Value")))
      .withColumn("Deflator_USD", lit(100) * col("Value") / col("Value2015"))
      .select(col("Country_Code"), col("Year"), col("Deflator_USD"))
      .where(col("Year") === lastYear)

    val exg = exchangeRates.select(col("Year").as("exg_Year"),
      col("Country_Code").as("exg_Code"), col("Value").as("Value_exg"))
    val deflatorPart = deflatorSeries
      .join(exg, col("Country_Code") === col("exg_Code") &&
                 col("Year") === col("exg_Year"), "left")
      .select(col("Country_Code"), col("Country_Label"), col("Year"),
        col("Value"), col("Value_exg"))
      .withColumn("Deflator_exg", col("Value") / col("Value_exg"))
      .withColumn("Deflator2015", anchor2015(col("Deflator_exg")))
      .withColumn("Deflator_USD", lit(100) * col("Deflator_exg") / col("Deflator2015"))
      .select(col("Country_Code"), col("Year"), col("Deflator_USD"))

    cpiPart.unionByName(deflatorPart).na.drop()
  }

  /** Growth-rate wide matrix -> (UNCTcc, Growth): the reference keeps
    * only the id column and the LAST year column
    * (`gpd_etl_pipeline.R:284-293`).
    */
  def growthFromWide(growthWide: DataFrame): DataFrame =
    growthWide.select(col("UNCTcc").cast("string").as("UNCTcc"),
      col(growthWide.columns.last).cast("double").as("Growth"))

  /** UNSD AMA wide year-matrix -> long facts (`gpd_etl_pipeline.R:55-63`):
    * filter the GDP indicator, unpivot every year column, pad codes.
    * `valueName` is the target variable name (constant/current).
    */
  def unsdWideToLong(wide: DataFrame, valueName: String): DataFrame = {
    val idCols = wide.columns.take(3)
    val yearCols = wide.columns.drop(3)
    wide
      .where(col("IndicatorName") === "Gross Domestic Product (GDP)")
      .unpivot(idCols.map(col), yearCols.map(col), "Year", valueName)
      .withColumn("Year", col("Year").cast("int"))
      .withColumn("Economy_Code", lpad(col(idCols.head).cast("string"), 3, "0"))
  }
}
