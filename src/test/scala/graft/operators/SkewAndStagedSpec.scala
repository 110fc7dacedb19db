package graft.operators

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Staged

class SkewAndStagedSpec extends SparkSpec {
  import spark.implicits._

  test("saltedJoin equals the plain inner join under heavy key skew") {
    val big = (1 to 20000).map(i => (if (i % 100 == 0) i else 7, s"p$i"))
      .toDF("k", "payload") // key 7 carries ~99% of rows
    val small = Seq((7, "hot"), (100, "cold"), (999, "absent-from-big"))
      .toDF("k", "label")
    val expected = big.join(small, Seq("k")).orderBy("payload")
    val got = Skew.saltedJoin(big, small, Seq("k")).orderBy("payload")
    assert(got.exceptAll(expected).count() === 0)
    assert(expected.exceptAll(got).count() === 0)
  }

  test("twoPhaseDistinctCount equals countDistinct") {
    val df = (1 to 5000).map(i => (i % 3, i % 97)).toDF("k", "v")
    val got = Skew.twoPhaseDistinctCount(df, col("k"), col("v"))
      .as[(Int, Long)].collect().toMap
    val want = df.groupBy("k").agg(countDistinct("v").as("c"))
      .as[(Int, Long)].collect().toMap
    assert(got === want)
  }

  test("Staged.readCsvSkip + dropTrailingRows trims scraped header and " +
       "footer lines like the reference's Taiwan extracts") {
    val dir = Files.createTempDirectory("staged").toFile
    val f = new java.io.File(dir, "scrape.csv")
    Files.writeString(f.toPath,
      """junk line 1
        |junk line 2
        |Period,Value
        |2014,1.5
        |2015,2.5
        |2016,NA
        |footer note
        |another footer
        |""".stripMargin)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("Period",
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("Value",
        org.apache.spark.sql.types.StringType)))
    val raw = Staged.readCsvSkip(spark, f.getAbsolutePath, skip = 2, schema)
    val trimmed = Staged.dropTrailingRows(raw, 2)
    val rows = trimmed.collect().map(r => (r.getString(0), r.getString(1)))
    assert(rows.toSeq === Seq(("2014", "1.5"), ("2015", "2.5"), ("2016", null)))
  }

  test("perEconomySeries reshapes the comparison into plot-ready series") {
    val cmp = Seq(("004", "Afghanistan", 2000, "V", Some(1.0), Some(2.0)))
      .toDF("Code", "Economy_Label", "Year", "Variable", "Value.old", "Value.new")
    val got = graft.plans.GdpPipeline.perEconomySeries(cmp)
      .select("Release", "Value").as[(String, Double)].collect().toSet
    assert(got === Set(("old", 1.0), ("new", 2.0)))
  }
}
