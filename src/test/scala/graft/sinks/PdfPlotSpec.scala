package graft.sinks

import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import graft.SparkSpec
import graft.sinks.PdfPlot.{Plot, Series}

class PdfPlotSpec extends SparkSpec {
  import spark.implicits._

  private def render(path: String, plots: Seq[Plot]): String = {
    PdfPlot.write(path, plots)
    new String(Files.readAllBytes(Paths.get(path)), ISO_8859_1)
  }

  test("writes a structurally valid PDF: header/EOF, page objects, " +
       "byte-exact xref offsets, escaped title text, dash + color ops") {
    val plots = Seq(
      Plot("Poland (test)", Seq(
        Series("old", PdfPlot.OldColor, dashed = false,
          Seq((1990.0, 1.0), (1991.0, 2.0), (1992.0, Double.NaN),
              (1993.0, 4.0))),
        Series("new", PdfPlot.NewColor, dashed = true,
          Seq((1990.0, 1.5), (1993.0, 3.0))))),
      Plot("Albania", Seq(Series("new", PdfPlot.NewColor, dashed = false,
        Seq((2000.0, 5.0), (2001.0, 6.0))))),
      Plot("Chad", Seq(Series("old", PdfPlot.OldColor, dashed = false,
        Seq((2000.0, 1.0), (2001.0, 1.0))))),
      Plot("Denmark", Seq(Series("old", PdfPlot.OldColor, dashed = true,
        Seq((2000.0, 2.0), (2002.0, 8.0))))))
    val path = Files.createTempDirectory("pdf").toString + "/t.pdf"
    val n = PdfPlot.write(path, plots)
    assert(n === 2, "4 plots at 3 per page = 2 pages")
    val s = new String(Files.readAllBytes(Paths.get(path)), ISO_8859_1)
    assert(s.startsWith("%PDF-1.4"))
    assert(s.endsWith("%%EOF\n"))
    assert(s.sliding("/Type /Page /Parent".length).count(
      _ == "/Type /Page /Parent") === 2, "one Page object per page")
    assert(s.contains("/Count 2"))
    // parens in the title must be escaped inside the text operator
    assert(s.contains("(Poland \\(test\\)) Tj"))
    // dashed series select the dash pattern; solid ones reset it
    assert(s.contains("[3 3] 0 d") && s.contains("[] 0 d"))
    // both reference colors appear as stroke ops
    assert(s.contains("0.98 0.69 0.09 RG") && s.contains("0.00 0.62 0.86 RG"))
    // a NaN point lifts the pen: Poland's old series strokes two subpaths
    // (2 S ops for it); overall there must be at least 5 strokes + axes
    assert(s.sliding(2).count(_ == "S\n") >= 7)
    // xref offsets are byte-exact: every entry points at "i 0 obj"
    val xrefAt = """startxref\n(\d+)\n""".r.findFirstMatchIn(s)
      .getOrElse(fail("missing startxref")).group(1).toInt
    assert(s.startsWith("xref", xrefAt))
    val entries = """(\d{10}) 00000 n""".r
      .findAllMatchIn(s.substring(xrefAt)).map(_.group(1).toInt).toSeq
    assert(entries.nonEmpty)
    entries.zipWithIndex.foreach { case (off, i) =>
      assert(s.startsWith(s"${i + 1} 0 obj", off),
        s"xref entry ${i + 1} points at offset $off which is not its object")
    }
    // declared stream lengths match the actual bytes
    """<< /Length (\d+) >>\nstream\n""".r.findAllMatchIn(s).foreach { m =>
      val start = m.end
      val len = m.group(1).toInt
      assert(s.startsWith("endstream", start + len),
        "stream /Length must be byte-exact")
    }
  }

  test("writeComparison: one plot per economy from the comparison " +
       "frame, reference layout and colors") {
    val cmp = Seq(
      ("008", "Albania", 2020, "GDP_at_constant_prices_2015",
        Some(100.0), Some(105.0)),
      ("008", "Albania", 2021, "GDP_at_constant_prices_2015",
        Some(110.0), None),
      ("008", "Albania", 2020, "GDP_at_current_prices",
        Some(90.0), Some(95.0)),
      ("616", "Poland", 2020, "GDP_at_constant_prices_2015",
        Some(500.0), Some(505.0)),
      ("616", "Poland", 2021, "GDP_at_current_prices",
        None, Some(520.0)))
      .toDF("Code", "Economy_Label", "Year", "Variable",
        "Value.old", "Value.new")
    val path = Files.createTempDirectory("pdf").toString + "/cmp.pdf"
    val pages = PdfPlot.writeComparison(cmp, path)
    assert(pages === 1, "2 economies at 3 per page = 1 page")
    val s = new String(Files.readAllBytes(Paths.get(path)), ISO_8859_1)
    assert(s.contains("(Albania) Tj") && s.contains("(Poland) Tj"))
    // 2 economies × (2 releases × 2 variables) = 8 series color ops
    assert(s.sliding(" RG".length).count(_ == " RG") >= 8)
  }
}
