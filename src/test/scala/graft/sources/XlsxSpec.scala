package graft.sources

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.functions._

import graft.SparkSpec

class XlsxSpec extends SparkSpec {

  private val refXlsx = "/root/reference/data/GDP growth rates.xlsx"

  test("reads the reference's real UNCTAD growth workbook: header, " +
       "width, values") {
    val df = Xlsx.read(spark, refXlsx)
    assert(df.columns.take(2).toSeq === Seq("UNCTcc", "Country/Region"),
      s"unexpected header: ${df.columns.take(5).mkString(", ")}")
    // year columns 1990..2024: stored as shared strings AND as raw
    // numerics in the same header row — both must surface as text
    assert(df.columns.contains("1990") && df.columns.contains("2024"),
      s"year columns missing: ${df.columns.mkString(", ")}")
    val n = df.count()
    assert(n > 100, s"expected the full economy list, got $n rows")
    // spot economy codes are 3-digit strings once padded downstream
    val codes = df.select(col("UNCTcc")).limit(5).collect().map(_.getString(0))
    assert(codes.forall(c => c != null && c.trim.nonEmpty))
  }

  test("growthFromWide over the NATIVE xlsx read: (UNCTcc, Growth) " +
       "from the last year column, castable to double") {
    val wide = Xlsx.read(spark, refXlsx)
    val g = graft.plans.GdpExtract.growthFromWide(wide)
    assert(g.columns.toSeq === Seq("UNCTcc", "Growth"))
    val rows = g.where(col("Growth").isNotNull).count()
    assert(rows > 50, s"expected real growth values, got $rows")
    // every non-null Growth parsed as a finite double
    val bad = g.where(col("Growth").isNotNull &&
      (isnan(col("Growth")) || col("Growth").cast("string").isNull)).count()
    assert(bad === 0)
  }

  test("synthesized workbook: shared/inline/rich strings, sparse rows, " +
       "booleans, formula strings, skip+header semantics") {
    val path = java.nio.file.Files.createTempDirectory("xlsx").toString +
      "/t.xlsx"
    writeTestXlsx(path)
    // two junk rows skipped, third row is the header
    val df = Xlsx.read(spark, path, skip = 2)
    assert(df.columns.toSeq === Seq("id", "name", "score", "flag", "_c4"))
    val rows = df.collect().map(r => (0 until 5).map(i =>
      Option(r.getString(i)).orNull))
    assert(rows.length === 3)
    // row 1: shared string + number; column E absent -> null
    assert(rows(0) === Seq("1", "alpha", "9.5", "true", null))
    // row 2: inline rich string concatenates runs; gap cell (C) null
    assert(rows(1) === Seq("2", "beta gamma", null, "false", null))
    // row 3: formula string result + trailing extra cell -> _c4
    assert(rows(2) === Seq("3", "delta", "7", null, "extra"))
  }

  test("colOf maps A/Z/AA/AB12 correctly") {
    assert(Xlsx.colOf("A1") === 0)
    assert(Xlsx.colOf("Z9") === 25)
    assert(Xlsx.colOf("AA1") === 26)
    assert(Xlsx.colOf("AB12") === 27)
  }

  /** Minimal but spec-complete workbook written with java.util.zip —
    * the same parts a real producer emits.
    */
  private def writeTestXlsx(path: String): Unit = {
    val z = new ZipOutputStream(new FileOutputStream(path))
    def part(name: String, body: String): Unit = {
      z.putNextEntry(new ZipEntry(name))
      z.write(body.getBytes("UTF-8"))
      z.closeEntry()
    }
    part("[Content_Types].xml",
      """<?xml version="1.0"?><Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"/>""")
    part("xl/workbook.xml",
      """<?xml version="1.0"?>
        |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
        |          xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
        |<sheets><sheet name="S1" sheetId="1" r:id="rId1"/></sheets>
        |</workbook>""".stripMargin)
    part("xl/_rels/workbook.xml.rels",
      """<?xml version="1.0"?>
        |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
        |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
        |</Relationships>""".stripMargin)
    part("xl/sharedStrings.xml",
      """<?xml version="1.0"?>
        |<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="6" uniqueCount="6">
        |<si><t>id</t></si><si><t>name</t></si><si><t>score</t></si>
        |<si><t>flag</t></si><si><t>alpha</t></si>
        |<si><r><t>junk </t></r><r><t>title</t></r></si>
        |</sst>""".stripMargin)
    // rows: 2 junk rows, header (A..D named, E unnamed in data row 6),
    // then data rows with a gap cell, inline rich string, boolean,
    // formula-string result, and a trailing extra column
    part("xl/worksheets/sheet1.xml",
      """<?xml version="1.0"?>
        |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
        |<sheetData>
        |<row r="1"><c r="A1" t="s"><v>5</v></c></row>
        |<row r="2"/>
        |<row r="3"><c r="A3" t="s"><v>0</v></c><c r="B3" t="s"><v>1</v></c>
        |  <c r="C3" t="s"><v>2</v></c><c r="D3" t="s"><v>3</v></c></row>
        |<row r="4"><c r="A4"><v>1</v></c><c r="B4" t="s"><v>4</v></c>
        |  <c r="C4"><v>9.5</v></c><c r="D4" t="b"><v>1</v></c></row>
        |<row r="5"><c r="A5"><v>2</v></c>
        |  <c r="B5" t="inlineStr"><is><r><t>beta </t></r><r><t>gamma</t></r></is></c>
        |  <c r="D5" t="b"><v>0</v></c></row>
        |<row r="6"><c r="A6"><v>3</v></c>
        |  <c r="B6" t="str"><f>CONCAT("del","ta")</f><v>delta</v></c>
        |  <c r="C6"><v>7</v></c><c r="E6" t="inlineStr"><is><t>extra</t></is></c></row>
        |</sheetData>
        |</worksheet>""".stripMargin)
    z.close()
  }
}
