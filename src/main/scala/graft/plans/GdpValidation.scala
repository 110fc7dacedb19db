package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.functions.Fns.{near, yearRuns}

/** The reference's five bookdown validation analyses (chapters 04-08)
  * as library functions over the comparison frame — its de-facto test
  * oracle (SURVEY §3 entry point 3, §5). All take the output of
  * `GdpPipeline.comparison` (columns Code, Economy_Label, Year,
  * Variable, `Value.old`, `Value.new`).
  */
object GdpValidation {

  private val vOld = col("`Value.old`")
  private val vNew = col("`Value.new`")

  /** Ch 04 (`04-discrepancies-before-last-year.Rmd:94-106`): rows where
    * old and new diverge beyond tol (default 2 USD) excluding the
    * estimated year, reported per economy as compressed year runs.
    */
  def discrepanciesBeforeLastYear(cmp: DataFrame, lastYear: Int,
                                  tol: Double = 2.0): DataFrame =
    cmp.where(col("Year") =!= lastYear)
      .where(vOld.isNotNull && vNew.isNotNull && !near(vNew, vOld, tol))
      .groupBy(col("Code"), col("Variable"))
      .agg(first(col("Economy_Label"), ignoreNulls = true).as("Economy_Label"),
        yearRuns(sort_array(collect_set(col("Year")))).as("Years"),
        count(lit(1)).as("n_years"))

  /** Ch 05 (`05-discrepancies-last-year.Rmd:10-28`): estimated-year
    * rows ranked by revision magnitude. |log(new/old)| ordering is
    * computed libm-free as greatest(new/old, old/new).
    */
  def topRevisionsLastYear(cmp: DataFrame, lastYear: Int,
                           k: Int = 19): DataFrame =
    cmp.where(col("Year") === lastYear &&
        vOld.isNotNull && vNew.isNotNull && vOld =!= 0.0)
      .select(col("Code"), col("Economy_Label"), col("Variable"),
        vOld.as("Value_old"), vNew.as("Value_new"),
        greatest(vNew / vOld, vOld / vNew).as("magnitude"))
      .orderBy(col("magnitude").desc, col("Code"), col("Variable"))
      .limit(k)

  /** Ch 06 (`06-missing-values.Rmd:5-14`): (economy, variable) with
    * values in the old release but not the new one.
    */
  def missingValues(cmp: DataFrame): DataFrame =
    cmp.where(vOld.isNotNull && vNew.isNull)
      .groupBy(col("Code"), col("Variable"))
      .agg(first(col("Economy_Label"), ignoreNulls = true).as("Economy_Label"),
        yearRuns(sort_array(collect_set(col("Year")))).as("Years"))

  /** Ch 07 (`07-added-values.Rmd:5-15`): present in new, absent in old. */
  def addedValues(cmp: DataFrame): DataFrame =
    cmp.where(vOld.isNull && vNew.isNotNull)
      .groupBy(col("Code"), col("Variable"))
      .agg(first(col("Economy_Label"), ignoreNulls = true).as("Economy_Label"),
        yearRuns(sort_array(collect_set(col("Year")))).as("Years"))

  /** Ch 08 (`08-deflators.Rmd:44-93`): implied deflator
    * 100*current/constant cross-checked against an independent deflator
    * series; per economy keep the max-|diff| rows (SURVEY A7) and flag
    * breaches of tol.
    */
  def deflatorCrossCheck(newDf: DataFrame, deflators: DataFrame,
                         tol: Double = 1.0): DataFrame = {
    val wide = newDf
      .groupBy(col("Economy_Code"), col("Economy_Label"), col("Year"))
      .pivot(col("Variable"),
        Seq("GDP_at_constant_prices_2015", "GDP_at_current_prices"))
      .agg(first(col("Value")))
    val implied = wide.withColumn("Implied_Deflator",
      lit(100) * col("GDP_at_current_prices") /
        col("GDP_at_constant_prices_2015"))
    val joined = implied.join(deflators,
        implied("Economy_Code") === deflators("Country_Code") &&
          implied("Year") === deflators("Year"), "left")
      .select(col("Economy_Code"), col("Economy_Label"), implied("Year"),
        col("Implied_Deflator"), col("Deflator_USD"))
      .where(col("Deflator_USD").isNotNull)
      .withColumn("Diff", col("Implied_Deflator") - col("Deflator_USD"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("Economy_Label"))
    joined
      .withColumn("max_abs", max(abs(col("Diff"))).over(w))
      .where(abs(col("Diff")) === col("max_abs"))
      .withColumn("breach", !near(col("Implied_Deflator"),
        col("Deflator_USD"), tol))
      .drop("max_abs")
  }
}
