package graft.sinks

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame

/** Dependency-free PDF line-plot sink — the reference's
  * `GDP_comparison_groups.pdf` export (`gdp_compare_with_old_data.R:
  * 54-90`: per-economy ggplot lines, old/new release × two variables,
  * 3 plots per page) written directly in the PDF page-description
  * language: uncompressed content streams of `m`/`l`/`S` path ops and
  * `BT … Tj ET` text, plus the object table and byte-exact xref. No
  * graphics library — PDF's core is plain text, and the JDK writes it.
  *
  * Scale note: plotting is an EXPORT step. The engine side
  * (`GdpPipeline.comparison` → per-economy series) is distributed; the
  * collect here is bounded by the economy list (~200 rows × years),
  * the same data the reference pulls into ggplot. 100 TB never flows
  * through a PDF.
  */
object PdfPlot {

  /** One polyline: points in data coordinates, sorted by x; NaN y
    * breaks the pen (gap in the line, matching ggplot's NA handling).
    */
  final case class Series(label: String, rgb: (Double, Double, Double),
                          dashed: Boolean, points: Seq[(Double, Double)])

  final case class Plot(title: String, series: Seq[Series])

  /** Reference palette (`gdp_compare_with_old_data.R:81`):
    * old = #FBAF17, new = #009EDB. */
  val OldColor: (Double, Double, Double) = (0.984, 0.686, 0.090)
  val NewColor: (Double, Double, Double) = (0.000, 0.620, 0.859)

  private val PageW = 595.0 // A4 portrait, points
  private val PageH = 842.0

  /** Write `plots`, `perPage` stacked per A4 page. Returns page count. */
  def write(path: String, plots: Seq[Plot], perPage: Int = 3): Int = {
    require(perPage >= 1)
    val pages = if (plots.isEmpty) Seq(Seq.empty[Plot])
                else plots.grouped(perPage).toSeq
    val nPages = pages.size
    // object ids: 1 Catalog, 2 Pages, 3 Font; then (page, contents)
    // pairs from 4
    val pageObjIds = (0 until nPages).map(i => 4 + 2 * i)
    val out = new ByteArrayOutputStream()
    def raw(s: String): Unit = out.write(s.getBytes(ISO_8859_1))
    val offsets = scala.collection.mutable.ArrayBuffer[Long](0L) // obj 0
    def obj(id: Int, body: String): Unit = {
      require(offsets.size == id, s"objects must be emitted in order: $id")
      offsets += out.size().toLong
      raw(s"$id 0 obj\n$body\nendobj\n")
    }
    raw("%PDF-1.4\n")
    obj(1, "<< /Type /Catalog /Pages 2 0 R >>")
    obj(2, s"<< /Type /Pages /Kids [${pageObjIds.map(i => s"$i 0 R").mkString(" ")}] /Count $nPages >>")
    obj(3, "<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
    pages.zipWithIndex.foreach { case (pagePlots, i) =>
      val content = pageContent(pagePlots, perPage)
      obj(4 + 2 * i,
        s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 $PageW $PageH] " +
          s"/Resources << /Font << /F1 3 0 R >> >> /Contents ${5 + 2 * i} 0 R >>")
      obj(5 + 2 * i,
        s"<< /Length ${content.getBytes(ISO_8859_1).length} >>\nstream\n" +
          content + "endstream")
    }
    val xrefAt = out.size()
    raw(s"xref\n0 ${offsets.size}\n")
    raw("0000000000 65535 f \n")
    offsets.drop(1).foreach(o => raw(f"$o%010d 00000 n \n"))
    raw(s"trailer\n<< /Size ${offsets.size} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n")
    Files.write(Paths.get(path), out.toByteArray)
    nPages
  }

  // PDF numbers use '.' — pin the locale (f"" formats via the default
  // locale, which would emit decimal commas on e.g. de_DE)
  private def fmt(d: Double): String =
    String.format(java.util.Locale.US, "%.2f", Double.box(d))

  private def esc(s: String): String =
    s.flatMap {
      case '(' => "\\("
      case ')' => "\\)"
      case '\\' => "\\\\"
      case c if c < 256 => c.toString
      case _ => "?" // Helvetica/Latin-1 page encoding
    }

  private def pageContent(plots: Seq[Plot], perPage: Int): String = {
    val sb = new StringBuilder
    val margin = 36.0
    val slotH = (PageH - 2 * margin) / perPage
    plots.zipWithIndex.foreach { case (p, slot) =>
      val top = PageH - margin - slot * slotH
      // plot box inside the slot: room for title above, labels left/below
      val (x0, x1) = (margin + 50, PageW - margin - 10)
      val (y0, y1) = (top - slotH + 30, top - 24)
      val pts = p.series.flatMap(_.points).filterNot(t => t._2.isNaN)
      val (dxMin, dxMax) = if (pts.isEmpty) (0.0, 1.0)
        else (pts.map(_._1).min, pts.map(_._1).max)
      val (dyMin0, dyMax0) = if (pts.isEmpty) (0.0, 1.0)
        else (math.min(0.0, pts.map(_._2).min), pts.map(_._2).max)
      val (dyMin, dyMax) = if (dyMax0 > dyMin0) (dyMin0, dyMax0)
                           else (dyMin0 - 1, dyMin0 + 1)
      val xSpan = if (dxMax > dxMin) dxMax - dxMin else 1.0
      def px(x: Double) = x0 + (x - dxMin) / xSpan * (x1 - x0)
      def py(y: Double) = y0 + (y - dyMin) / (dyMax - dyMin) * (y1 - y0)
      // title
      sb ++= s"BT /F1 11 Tf ${fmt(x0)} ${fmt(top - 14)} Td (${esc(p.title)}) Tj ET\n"
      // axes (left + bottom), thin black
      sb ++= "0 0 0 RG 0.5 w [] 0 d\n"
      sb ++= s"${fmt(x0)} ${fmt(y1)} m ${fmt(x0)} ${fmt(y0)} l ${fmt(x1)} ${fmt(y0)} l S\n"
      // axis extremes
      sb ++= s"BT /F1 7 Tf ${fmt(x0 - 4)} ${fmt(y0 - 10)} Td (${esc(fmt(dxMin))}) Tj ET\n"
      sb ++= s"BT /F1 7 Tf ${fmt(x1 - 18)} ${fmt(y0 - 10)} Td (${esc(fmt(dxMax))}) Tj ET\n"
      val yLabel = String.format(java.util.Locale.US, "%.3g", Double.box(dyMax))
      sb ++= s"BT /F1 7 Tf ${fmt(margin)} ${fmt(y1 - 4)} Td (${esc(yLabel)}) Tj ET\n"
      // series polylines; NaN breaks the pen
      p.series.foreach { s =>
        val (r, g, b) = s.rgb
        sb ++= s"${fmt(r)} ${fmt(g)} ${fmt(b)} RG 1 w ${if (s.dashed) "[3 3] 0 d" else "[] 0 d"}\n"
        var penDown = false
        s.points.sortBy(_._1).foreach { case (x, y) =>
          if (y.isNaN) { if (penDown) sb ++= "S\n"; penDown = false }
          else {
            sb ++= s"${fmt(px(x))} ${fmt(py(y))} ${if (penDown) "l" else "m"}\n"
            penDown = true
          }
        }
        if (penDown) sb ++= "S\n"
      }
    }
    sb.toString
  }

  /** The full reference export: `comparison` output (columns `Code,
    * Economy_Label, Year, Variable, Value.old, Value.new`) → one plot
    * per economy (4 lines: release × variable, reference colors,
    * current-prices dashed), 3 per page, ordered by label — the
    * `marrangeGrob(nrow=3, ncol=1)` layout. Returns page count.
    *
    * Label-side note: the reference iterates old-release labels
    * (`gdp_compare_with_old_data.R:88` sorts `Economy_Label.old`);
    * the comparison frame carries only the NEW-side label (its
    * golden-pinned schema), so economies present solely in the old
    * release — label null here — are skipped rather than plotted.
    */
  def writeComparison(cmp: DataFrame, path: String): Int = {
    val rows = cmp
      .select("Economy_Label", "Year", "Variable", "`Value.old`", "`Value.new`")
      .collect()
      .filter(_.get(0) != null)
    def num(v: Any): Double = v match {
      case null => Double.NaN
      case d: java.lang.Number => d.doubleValue()
      case _ => Double.NaN
    }
    val plots = rows.groupBy(_.getString(0)).toSeq.sortBy(_._1).map {
      case (label, rs) =>
        val series = for {
          (rel, col, rgb) <- Seq(("old", 3, OldColor), ("new", 4, NewColor))
          variable <- rs.map(_.getString(2)).distinct.sorted
        } yield Series(
          s"$rel $variable", rgb,
          dashed = variable.contains("current"),
          points = rs.filter(_.getString(2) == variable)
            .map(r => (num(r.get(1)), num(r.get(col))))
            .sortBy(_._1).toSeq)
        Plot(label, series)
    }
    write(path, plots)
  }
}
