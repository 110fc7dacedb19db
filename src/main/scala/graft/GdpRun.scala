package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.plans.{GdpPipeline => P, GdpSchemas => S}

/** Offline pipeline runner: executes every network-free stage of the
  * reference pipeline over the captured inputs and writes the three
  * outputs (`gdp_update.csv`-shaped, USIS upload, comparison + plot
  * series). Demonstrates the switch path for a reference user:
  *
  *   runMain graft.GdpRun /root/reference /tmp/gdp_out [refDate] [lastYear]
  *
  * The live extracts (UNSD/Taiwan/USIS HTTP) are the only stages not
  * exercised here — their transforms are in GdpExtract and are fed
  * staged frames in production.
  */
object GdpRun {

  /** The release year of the captured reference inputs — the default
    * for the `lastYear` endpoint when none is passed. The reference
    * hard-codes its `last_year` in the script body (SURVEY §7.5); here
    * it is a CLI/env seam (`args(3)` or SPARK_GRAFT_LAST_YEAR) so next
    * year's release is a flag, not a code edit.
    */
  val DefaultLastYear: Int = 2024

  def main(args: Array[String]): Unit = {
    val refDir = args.headOption.getOrElse("/root/reference")
    val outDir = if (args.length > 1) args(1) else "/tmp/gdp_out"
    val refDateStr = args.lift(2).getOrElse(
      java.time.LocalDate.now.format(java.time.format.DateTimeFormatter
        .ofPattern("d-MMM-yy", java.util.Locale.US)))
    val lastYear = args.lift(3).orElse(sys.env.get("SPARK_GRAFT_LAST_YEAR"))
      .map(_.toInt).getOrElse(DefaultLastYear)

    val spark = SparkSession.builder()
      .master(s"local[${math.min(32, Runtime.getRuntime.availableProcessors())}]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val dims = S.readCsv(spark, s"$refDir/data/Dim_Countries.csv", S.dimCountries)
    val edges = S.readCsv(spark, s"$refDir/data/Dim_Countries_Hierarchy_All.csv", S.hierarchy)
    val labels = S.readCsv(spark, s"$refDir/data/lab_all.csv", S.labels)
    val oldRelease = S.readCsv(spark,
      s"$refDir/data/US.GDPTotal_20250718_104458.csv", S.oldRelease)

    // Facts: the golden leaf rows stand in for the live extract output
    // (post compute_missing_values/estimate/round; SURVEY §7.2).
    val leaves = S.readCsv(spark, s"$refDir/output/gdp_update.csv", S.gdpUpdate)
      .where(length(col("Economy_Code")) < 4)
      .select("Economy_Code", "Year", "Variable", "Value")

    val staged = P.addEconomyLabels(
      P.deleteOutOfValidRange(leaves, dims), labels)
    val full = P.addComments(P.computeAggregateValues(staged, edges))

    S.writeCsv(full.withColumn("Value", col("Value").cast("long")),
      s"$outDir/gdp_update")
    S.writeCsv(
      P.usisProjection(full, lastYear, refDateStr)
        .withColumn("Value", col("Value").cast("long")),
      s"$outDir/gdp_update_usis")

    val cmp = P.comparison(oldRelease, labels, full)
    S.writeCsv(cmp.withColumn("Year", col("Year").cast("int")),
      s"$outDir/gdp_comparison")
    S.writeCsv(P.perEconomySeries(cmp), s"$outDir/gdp_series")
    // the reference's per-economy plot book (3 per page, old vs new
    // release in the reference palette) — sinks/PdfPlot, zero deps
    val pdfPages = graft.sinks.PdfPlot.writeComparison(cmp,
      s"$outDir/GDP_comparison_groups.pdf")

    println(s"[gdp-run] update=${full.count()} usis=" +
      s"${P.usisProjection(full, lastYear, refDateStr).count()} " +
      s"comparison=${cmp.count()} pdfPages=$pdfPages -> $outDir")
    spark.stop()
  }
}
