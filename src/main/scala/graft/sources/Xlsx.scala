package graft.sources

import java.util.zip.ZipFile

import javax.xml.stream.{XMLInputFactory, XMLStreamConstants, XMLStreamReader}

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Native .xlsx staging source — the reference's Excel ingest
  * (`gpd_etl_pipeline.R:55,61,284`: `read_excel(tf, skip = 2)` over
  * downloaded UNSD/UNCTAD workbooks) without any Excel library: an
  * .xlsx file is a ZIP of SpreadsheetML parts, and both `java.util.zip`
  * and StAX ship in the JDK, so this stays inside the offline-jar
  * constraint.
  *
  * Staging model (same as the CSV/HTTP staging sources): an .xlsx is a
  * SMALL-extract format — the reference's workbooks are hundreds of
  * rows — parsed once on the driver into string cells, then handed to
  * Spark as a DataFrame for the distributed transform layer
  * (`GdpExtract.growthFromWide` / `unsdWideToLong`). Nobody ships
  * 100 TB as Excel; the scale path starts after staging.
  *
  * Covered: shared strings (including rich-text runs), inline strings,
  * formula string results, booleans, numbers (raw text preserved —
  * casts happen downstream), sparse rows (missing cells → null),
  * `skip` + header-row semantics matching `readxl::read_excel(skip=)`.
  * Not covered (reference never uses them): date styling (raw serial
  * numbers come through), multiple sheets beyond index selection.
  */
object Xlsx {

  /** Read worksheet `sheet` (0-based workbook order) of an .xlsx into
    * an all-string DataFrame: drop `skip` leading rows, take the next
    * row as the header (empty header cells become `_cN`, duplicates
    * get `_N` suffixes), remaining rows are data padded/truncated to
    * the header width.
    */
  def read(spark: SparkSession, path: String, skip: Int = 0,
           sheet: Int = 0): DataFrame = {
    val rows = parseRows(path, sheet).drop(skip)
    require(rows.nonEmpty, s"no rows after skip=$skip in $path")
    val rawHeader = rows.head
    val width = math.max(rawHeader.length,
      if (rows.size > 1) rows.tail.map(_.length).max else 0)
    val seen = mutable.Map.empty[String, Int]
    val header = (0 until width).map { i =>
      val base = rawHeader.lift(i).flatten.map(_.trim).filter(_.nonEmpty)
        .getOrElse(s"_c$i")
      val n = seen.getOrElse(base, 0)
      seen(base) = n + 1
      if (n == 0) base else s"${base}_$n"
    }
    val data = rows.tail.map { r =>
      Row.fromSeq((0 until width).map(i => r.lift(i).flatten.orNull))
    }
    val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
    spark.createDataFrame(
      spark.sparkContext.parallelize(data.toSeq, 1), schema)
  }

  /** The sheet as rows of cells; `None` = a cell with no value (gap or
    * empty). Driver-side; one streaming XML pass per part.
    */
  def parseRows(path: String, sheet: Int = 0): Vector[Vector[Option[String]]] = {
    val zip = new ZipFile(path)
    try {
      val sheetPath = resolveSheetPath(zip, sheet)
      val shared = Option(zip.getEntry("xl/sharedStrings.xml"))
        .map(e => parseSharedStrings(zip, e.getName))
        .getOrElse(Vector.empty)
      parseSheet(zip, sheetPath, shared)
    } finally zip.close()
  }

  private def newReader(zip: ZipFile, entry: String): XMLStreamReader = {
    val f = XMLInputFactory.newInstance()
    // harden against XXE: staged files are downloads
    f.setProperty(XMLInputFactory.IS_SUPPORTING_EXTERNAL_ENTITIES, false)
    f.setProperty(XMLInputFactory.SUPPORT_DTD, false)
    f.createXMLStreamReader(zip.getInputStream(zip.getEntry(entry)))
  }

  /** workbook.xml lists sheets in order with relationship ids;
    * workbook.xml.rels maps those ids to part paths.
    */
  private def resolveSheetPath(zip: ZipFile, sheet: Int): String = {
    val rids = mutable.ArrayBuffer.empty[String]
    val wb = newReader(zip, "xl/workbook.xml")
    try {
      while (wb.hasNext) {
        if (wb.next() == XMLStreamConstants.START_ELEMENT &&
            wb.getLocalName == "sheet") {
          (0 until wb.getAttributeCount)
            .find(i => wb.getAttributeLocalName(i) == "id")
            .foreach(i => rids += wb.getAttributeValue(i))
        }
      }
    } finally wb.close()
    require(sheet >= 0 && sheet < rids.size,
      s"sheet index $sheet out of range (${rids.size} sheets)")
    val rels = mutable.Map.empty[String, String]
    val rl = newReader(zip, "xl/_rels/workbook.xml.rels")
    try {
      while (rl.hasNext) {
        if (rl.next() == XMLStreamConstants.START_ELEMENT &&
            rl.getLocalName == "Relationship") {
          val attrs = (0 until rl.getAttributeCount)
            .map(i => rl.getAttributeLocalName(i) -> rl.getAttributeValue(i))
            .toMap
          for (id <- attrs.get("Id"); t <- attrs.get("Target"))
            rels(id) = t
        }
      }
    } finally rl.close()
    val target = rels.getOrElse(rids(sheet),
      throw new IllegalArgumentException(s"no relationship for sheet $sheet"))
    if (target.startsWith("/")) target.drop(1) else s"xl/$target"
  }

  /** sharedStrings.xml: one entry per `<si>`, concatenating every
    * nested `<t>` (plain and rich-text runs).
    */
  private def parseSharedStrings(zip: ZipFile, entry: String): Vector[String] = {
    val out = Vector.newBuilder[String]
    val r = newReader(zip, entry)
    try {
      var sb: StringBuilder = null
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "si" =>
          sb = new StringBuilder
        case XMLStreamConstants.START_ELEMENT if r.getLocalName == "t" =>
          if (sb != null) sb.append(r.getElementText)
        case XMLStreamConstants.END_ELEMENT if r.getLocalName == "si" =>
          out += sb.toString; sb = null
        case _ =>
      }
    } finally r.close()
    out.result()
  }

  private def parseSheet(zip: ZipFile, entry: String,
                         shared: Vector[String]): Vector[Vector[Option[String]]] = {
    val rows = Vector.newBuilder[Vector[Option[String]]]
    val r = newReader(zip, entry)
    try {
      var cells: mutable.ArrayBuffer[Option[String]] = null
      var colIdx = -1           // last filled column (gap tracking)
      var cellType = ""
      var pendingCol = -1       // column of the open <c>
      var inValue = false
      var inInlineStr = false
      var text = new StringBuilder
      while (r.hasNext) r.next() match {
        case XMLStreamConstants.START_ELEMENT => r.getLocalName match {
          case "row" =>
            cells = mutable.ArrayBuffer.empty; colIdx = -1
          case "c" if cells != null =>
            val attrs = (0 until r.getAttributeCount)
              .map(i => r.getAttributeLocalName(i) -> r.getAttributeValue(i))
              .toMap
            pendingCol = attrs.get("r").map(colOf).getOrElse(colIdx + 1)
            cellType = attrs.getOrElse("t", "")
          case "is" => inInlineStr = true
          case "v" | "t" if cells != null && pendingCol >= 0 =>
            // <v> always carries the value; <t> only inside <is>
            if (r.getLocalName == "v" || inInlineStr) {
              inValue = true; text = new StringBuilder
            }
          case _ =>
        }
        case XMLStreamConstants.CHARACTERS | XMLStreamConstants.CDATA
            if inValue =>
          text.append(r.getText)
        case XMLStreamConstants.END_ELEMENT => r.getLocalName match {
          case "v" | "t" if inValue =>
            inValue = false
            val raw = text.toString
            val value = cellType match {
              case "s" => shared.lift(raw.trim.toInt)
              case "b" => Some(if (raw.trim == "1") "true" else "false")
              case _   => Some(raw) // n (default), str, inlineStr, e
            }
            while (cells.length < pendingCol) cells += None // gap fill
            if (cells.length == pendingCol) cells += value
            else cells(pendingCol) = (cells(pendingCol), value) match {
              // further <t> runs of one rich inline string concatenate
              case (Some(a), Some(b)) => Some(a + b)
              case (a, b)             => b.orElse(a)
            }
          case "is" => inInlineStr = false
          case "c" =>
            if (cells != null && pendingCol >= 0) {
              while (cells.length <= pendingCol) cells += None // empty cell
              colIdx = pendingCol
            }
            pendingCol = -1; cellType = ""
          case "row" if cells != null =>
            rows += cells.toVector; cells = null
          case _ =>
        }
        case _ =>
      }
    } finally r.close()
    rows.result()
  }

  /** "AB12" → 0-based column 27. */
  private[sources] def colOf(ref: String): Int = {
    var c = 0
    var i = 0
    while (i < ref.length && ref.charAt(i).isLetter) {
      c = c * 26 + (ref.charAt(i).toUpper - 'A' + 1)
      i += 1
    }
    c - 1
  }
}
