package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types._

/** Explicit schemas + CSV readers for the GDP ETL data model
  * (SURVEY.md §1). Schemas are always explicit: economy codes are
  * zero-padded strings (`"070"`, `"0000"`), and schema inference would
  * re-introduce the `"0000" -> 0` coercion the reference has to patch
  * around (`gpd_etl_pipeline.R:404-407`).
  *
  * R-parity read options: `header=true`, null token `"NA"`.
  */
object GdpSchemas {

  val dimCountries: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Label", StringType),
    StructField("ValidFrom", IntegerType),
    StructField("ValidTo", IntegerType),
    StructField("IsTarget", StringType)))

  val hierarchy: StructType = StructType(Seq(
    StructField("Parent_Code", StringType),
    StructField("Parent_Label", StringType),
    StructField("Parent_ValidFrom", IntegerType),
    StructField("Parent_ValidTo", IntegerType),
    StructField("Parent_IsTarget", StringType),
    StructField("Child_Code", StringType),
    StructField("Child_Label", StringType),
    StructField("Child_ValidFrom", IntegerType),
    StructField("Child_ValidTo", IntegerType),
    StructField("Child_IsTarget", StringType)))

  val labels: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Label", StringType)))

  /** Long fact schema (`output/gdp_update.csv`). */
  val gdpUpdate: StructType = StructType(Seq(
    StructField("Economy_Code", StringType),
    StructField("Economy_Label", StringType),
    StructField("Year", IntegerType),
    StructField("Variable", StringType),
    StructField("Value", DoubleType),
    StructField("CommentEN", StringType),
    StructField("CommentFR", StringType)))

  /** Previous-release wide schema (`US.GDPTotal_*.csv`). */
  val oldRelease: StructType = StructType(Seq(
    StructField("Economy_Label", StringType),
    StructField("Year", IntegerType),
    StructField("US_at_current_prices_Value", DoubleType),
    StructField("US_at_current_prices_Footnote", StringType),
    StructField("US_at_current_prices_MissingValue", StringType),
    StructField("US_at_constant_prices_2015_Value", DoubleType),
    StructField("US_at_constant_prices_2015_Footnote", StringType),
    StructField("US_at_constant_prices_2015_MissingValue", StringType)))

  /** USIS extract shape (`exchange_rates.csv` and friends). */
  val usisExtract: StructType = StructType(Seq(
    StructField("Year", IntegerType),
    StructField("Period_Code", StringType),
    StructField("Period_Label", StringType),
    StructField("Country_Code", StringType),
    StructField("Country_Label", StringType),
    StructField("Country_ValidFrom", IntegerType),
    StructField("Country_ValidTo", IntegerType),
    StructField("Country_IsTarget", StringType),
    StructField("Value", DoubleType),
    StructField("DataSource_Code", StringType),
    StructField("DataSource_Label", StringType),
    StructField("DataStatus_Code", StringType),
    StructField("DataStatus_Label", StringType),
    StructField("DataConfidentiality_Code", StringType),
    StructField("DataConfidentiality_Label", StringType),
    StructField("Comment_English", StringType),
    StructField("Comment_French", StringType),
    StructField("Comment_Confidentiality_Code", StringType),
    StructField("Comment_Confidentiality_Label", StringType)))

  /** Comparison output (`output/gdp_comparison.csv`). */
  val gdpComparison: StructType = StructType(Seq(
    StructField("Code", StringType),
    StructField("Economy_Label", StringType),
    StructField("Year", IntegerType),
    StructField("Variable", StringType),
    StructField("Value.old", DoubleType),
    StructField("Value.new", DoubleType),
    StructField("CommentEN", StringType),
    StructField("CommentFR", StringType)))

  /** USIS upload output (`output/gdp_update_usis.csv`). */
  val gdpUsis: StructType = StructType(Seq(
    StructField("Series", IntegerType),
    StructField("Country", StringType),
    StructField("Year", IntegerType),
    StructField("Period", StringType),
    StructField("NAComponent", StringType),
    StructField("Measure", StringType),
    StructField("Source", StringType),
    StructField("DataSource", StringType),
    StructField("Value", DoubleType),
    StructField("DataStatus", StringType),
    StructField("DataConfidentiality", StringType),
    StructField("CommentEN", StringType),
    StructField("CommentFR", StringType),
    StructField("CommentConfidentiality", StringType),
    StructField("RefDate", StringType)))

  /** R-parity CSV read: header, "NA" nulls, explicit schema. */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read.schema(schema)
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(path)

  /** R `write_csv` parity: header, nulls as "NA", single file (fine for
    * the <100k-row exports; large frames should keep default sharding).
    */
  def writeCsv(df: DataFrame, path: String): Unit =
    df.coalesce(1).write.mode("overwrite")
      .option("header", "true")
      .option("nullValue", "NA")
      .csv(path)
}
