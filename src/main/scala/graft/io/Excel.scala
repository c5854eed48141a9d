package graft.io

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/**
 * S5 / S13 — Excel (.xlsx) source and sink (`/root/reference/src/utils/
 * file_loader.py:734-832` ExcelLoader, `/root/reference/src/engine/report/
 * exporter.py:7-36` generate_formatted_excel).
 *
 * The reference loads workbooks driver-side through pandas/openpyxl and its
 * envelope is UI uploads (≤ ~100 MB); the faithful Spark analogue is a
 * DRIVER-SIDE parse feeding `createDataFrame` — never a distributed scan of
 * a zip container — after which the table is a normal DataFrame and the
 * standard post-load pipeline (S10 validation, S11 sanitization) applies.
 * xlsx is a zip of SpreadsheetML parts, so the JDK's zip + DOM machinery
 * covers the format without any external dependency:
 *
 *  - reader: workbook.xml (sheet order + r:id) → workbook.xml.rels (r:id →
 *    part) → sharedStrings.xml (t="s" cells) → each sheet's `sheetData`.
 *    Cell types handled: shared string, inline string, formula-cached
 *    string (t="str"), boolean, and numeric (integral values rendered
 *    without a decimal point, pandas-like). Cells come back as STRINGS —
 *    the same shape the CSV fallback path produces — with blank header
 *    cells named `Unnamed: i` (pandas convention, which S10's suspicious-
 *    column check already recognizes).
 *  - writer: inline strings (no sharedStrings table needed), numbers and
 *    booleans as native cell types, nulls as absent cells; one header row
 *    (`to_excel(index=False)` shape). Row counts are bounded by the
 *    format's own 1 048 576-row sheet limit and enforced loudly — an Excel
 *    artifact is a REPORT surface; bulk data exports go to parquet/CSV.
 */
object Excel {

  private val SheetRowLimit = 1048576
  private val SheetColLimit = 16384 // column "XFD"

  // --------------------------------------------------------------- reading

  private def xml(bytes: Array[Byte]): org.w3c.dom.Document = {
    def parse(nsAware: Boolean) = {
      val f = javax.xml.parsers.DocumentBuilderFactory.newInstance()
      f.setNamespaceAware(nsAware)
      // no DTDs/external entities in SpreadsheetML — close the XXE door
      f.setFeature("http://apache.org/xml/features/disallow-doctype-decl", true)
      f.newDocumentBuilder().parse(new java.io.ByteArrayInputStream(bytes))
    }
    // namespace-aware so producers that PREFIX the main SpreadsheetML
    // namespace (<x:sheet>, <x:row> — valid OOXML) parse the same as the
    // common default-namespace form (lookups below match by LOCAL name);
    // sloppy producers with UNDECLARED prefixes fail the strict parse, and
    // the robust-loader contract says read them anyway → lenient retry
    try parse(nsAware = true)
    catch { case _: org.xml.sax.SAXException => parse(nsAware = false) }
  }

  private def zipEntry(z: java.util.zip.ZipFile, name: String): Option[Array[Byte]] =
    Option(z.getEntry(name)).map { e =>
      val in = z.getInputStream(e)
      try in.readAllBytes() finally in.close()
    }

  // local-name lookup first (namespace-aware docs, any prefix); fall back to
  // qualified-name lookup for docs from the lenient non-NS parse, where
  // localName is null and the NS lookup matches nothing
  private def byTag(nl: => org.w3c.dom.NodeList,
                    fallback: => org.w3c.dom.NodeList): Seq[org.w3c.dom.Element] = {
    val a = nl
    val n = if (a.getLength > 0) a else fallback
    (0 until n.getLength).map(n.item(_).asInstanceOf[org.w3c.dom.Element])
  }
  private def elems(d: org.w3c.dom.Document, tag: String): Seq[org.w3c.dom.Element] =
    byTag(d.getElementsByTagNameNS("*", tag), d.getElementsByTagName(tag))
  private def childElems(e: org.w3c.dom.Element, tag: String): Seq[org.w3c.dom.Element] =
    byTag(e.getElementsByTagNameNS("*", tag), e.getElementsByTagName(tag))

  private val RelNs = "http://schemas.openxmlformats.org/officeDocument/2006/relationships"
  /** r:id regardless of the document's prefix for the relationships ns. */
  private def relId(e: org.w3c.dom.Element): String = {
    val ns = e.getAttributeNS(RelNs, "id")
    if (ns.nonEmpty) ns else e.getAttribute("r:id")
  }

  /** "B3" → 0-based column index 1. */
  private[graft] def colIndex(cellRef: String): Int = {
    var i = 0; var acc = 0
    while (i < cellRef.length && cellRef.charAt(i).isLetter) {
      acc = acc * 26 + (cellRef.charAt(i).toUpper - 'A' + 1); i += 1
    }
    acc - 1
  }

  /** 0-based column index 1 → "B". */
  private[graft] def colLetters(idx: Int): String = {
    var n = idx + 1; val sb = new StringBuilder
    while (n > 0) { val r = (n - 1) % 26; sb.insert(0, ('A' + r).toChar); n = (n - 1) / 26 }
    sb.toString
  }

  /** Sheet names in workbook order (`metadata['available_sheets']`). */
  def sheetNames(path: String): Seq[String] = {
    val z = new java.util.zip.ZipFile(path)
    try {
      val wb = xml(zipEntry(z, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)")))
      elems(wb, "sheet").map(_.getAttribute("name"))
    } finally z.close()
  }

  /** Raw cell grid of one sheet: rows of (possibly null) strings, in sheet
    * order, each row padded to the max seen width. */
  private def sheetGrid(z: java.util.zip.ZipFile, part: String,
                        shared: IndexedSeq[String]): Seq[Array[String]] = {
    val doc = xml(zipEntry(z, part)
      .getOrElse(throw new IllegalArgumentException(s"missing sheet part $part")))
    val rows = elems(doc, "row").map { r =>
      // the `r` (cell reference) attribute is optional in SpreadsheetML — a
      // cell without one sits immediately after the previous cell
      var nextImplied = 0
      val cells = childElems(r, "c").flatMap { c =>
        val ref = c.getAttribute("r")
        val idx = if (ref.nonEmpty) colIndex(ref) else nextImplied
        nextImplied = idx + 1
        val t = c.getAttribute("t")
        val v = childElems(c, "v").headOption.map(_.getTextContent)
        val value: String = t match {
          case "s" => v.map(s => shared(s.trim.toInt)).orNull
          case "inlineStr" =>
            childElems(c, "is").headOption
              .map(is => childElems(is, "t").map(_.getTextContent).mkString).orNull
          case "str" => v.orNull // formula's cached string result
          case "b" => v.map(x => if (x.trim == "1") "True" else "False").orNull
          case _ => v.map(renderNumber).orNull
        }
        if (value == null) None else Some(idx -> value)
      }
      cells
    }.filter(_.nonEmpty)
    if (rows.isEmpty) return Seq.empty
    val width = rows.map(_.map(_._1).max).max + 1
    rows.map { cells =>
      val arr = new Array[String](width)
      cells.foreach { case (i, s) => if (i < width) arr(i) = s }
      arr
    }
  }

  /** Excel stores every number as a double; pandas shows 42, not 42.0 —
    * render integral values (within exact-double range) without the point. */
  private def renderNumber(raw: String): String = {
    val s = raw.trim
    val d = try s.toDouble catch { case _: NumberFormatException => return s }
    if (d.isWhole && math.abs(d) < 1e15) d.toLong.toString else s
  }

  private def headerName(cell: String, i: Int): String =
    if (cell == null || cell.trim.isEmpty) s"Unnamed: $i" else cell

  /** S5 — load one sheet (default: the FIRST sheet, pandas
    * `sheet_name=0`). First row is the header; all columns are strings
    * (the robust-loader contract — numeric coercion is C2's job). */
  def readXlsx(spark: SparkSession, path: String,
               sheet: Option[String] = None): DataFrame = {
    // parse ONLY the requested sheet's part: with sheet=None the r5 path
    // parsed every sheet's full grid just to return the first (ADVICE r5) —
    // the name listing reads just workbook.xml, not the cell parts
    val wanted = sheet.orElse(sheetNames(path).headOption)
      .getOrElse(throw new IllegalArgumentException(s"$path has no sheets"))
    val all = readAllSheets(spark, path, Some(Seq(wanted)))
    all.getOrElse(wanted,
      throw new IllegalArgumentException(
        s"sheet '$wanted' not in $path (has: ${sheetNames(path).mkString(", ")})"))
  }

  /** S5 — load every sheet (pandas `sheet_name=None` → dict of frames).
    * Insertion-ordered by workbook sheet order. */
  def readAllSheets(spark: SparkSession, path: String,
                    only: Option[Seq[String]] = None): scala.collection.immutable.ListMap[String, DataFrame] = {
    val z = new java.util.zip.ZipFile(path)
    try {
      val wb = xml(zipEntry(z, "xl/workbook.xml")
        .getOrElse(throw new IllegalArgumentException(s"$path: not an xlsx (no xl/workbook.xml)")))
      val rels = zipEntry(z, "xl/_rels/workbook.xml.rels").map(xml) match {
        case Some(r) => elems(r, "Relationship")
          .map(e => e.getAttribute("Id") -> e.getAttribute("Target")).toMap
        case None => Map.empty[String, String]
      }
      val shared: IndexedSeq[String] = zipEntry(z, "xl/sharedStrings.xml") match {
        case Some(b) => elems(xml(b), "si").map(si =>
          childElems(si, "t").map(_.getTextContent).mkString).toIndexedSeq
        case None => IndexedSeq.empty
      }
      val sheets = elems(wb, "sheet").map { e =>
        val name = e.getAttribute("name")
        val rid = relId(e)
        val target = rels.getOrElse(rid, s"worksheets/sheet${e.getAttribute("sheetId")}.xml")
        val part = if (target.startsWith("/")) target.drop(1)
                   else s"xl/${target.stripPrefix("./")}"
        name -> part
      }
      val wanted = only match {
        case Some(ns) => sheets.filter { case (n, _) => ns.contains(n) }
        case None => sheets
      }
      scala.collection.immutable.ListMap(wanted.map { case (name, part) =>
        val grid = sheetGrid(z, part, shared)
        val df =
          if (grid.isEmpty)
            spark.createDataFrame(new java.util.ArrayList[Row](), StructType(Nil))
          else {
            val header = grid.head.zipWithIndex
              .map { case (c, i) => headerName(c, i) }
            val schema = StructType(header.map(StructField(_, StringType, nullable = true)))
            val data = grid.tail.map { r =>
              Row.fromSeq(header.indices.map(i => if (i < r.length) r(i) else null))
            }
            spark.createDataFrame(
              new java.util.ArrayList[Row](scala.jdk.CollectionConverters
                .SeqHasAsJava(data).asJava), schema)
          }
        name -> df
      }: _*)
    } finally z.close()
  }

  // --------------------------------------------------------------- writing

  private def esc(s: String): String = {
    val sb = new StringBuilder(s.length)
    s.foreach {
      case '&' => sb.append("&amp;")
      case '<' => sb.append("&lt;")
      case '>' => sb.append("&gt;")
      case '"' => sb.append("&quot;")
      case c if c < 0x20 && c != '\t' && c != '\n' && c != '\r' =>
        sb.append(' ') // control chars are invalid in XML 1.0
      case c => sb.append(c)
    }
    sb.toString
  }

  /** Excel sheet-name rules: no []:*?/\ and ≤ 31 chars. */
  private[graft] def safeSheetName(n: String, i: Int): String = {
    val cleaned = n.map(c => if ("[]:*?/\\".contains(c)) '_' else c).take(31)
    if (cleaned.trim.isEmpty) s"Sheet${i + 1}" else cleaned
  }

  private def cellXml(ref: String, v: Any): Option[String] = v match {
    case null => None
    case b: Boolean => Some(s"""<c r="$ref" t="b"><v>${if (b) 1 else 0}</v></c>""")
    // NaN/Infinity are not valid SpreadsheetML numerics (Excel reports the
    // workbook corrupt): NaN → blank cell (pandas' missing-value shape);
    // ±Infinity → inline string, loud rather than silently dropped
    case d: Double if d.isNaN => None
    case f: Float if f.isNaN => None
    case d: Double if d.isInfinite =>
      Some(s"""<c r="$ref" t="inlineStr"><is><t>${if (d > 0) "Infinity" else "-Infinity"}</t></is></c>""")
    case f: Float if f.isInfinite =>
      Some(s"""<c r="$ref" t="inlineStr"><is><t>${if (f > 0) "Infinity" else "-Infinity"}</t></is></c>""")
    case n @ (_: Byte | _: Short | _: Int | _: Long | _: Float | _: Double) =>
      Some(s"""<c r="$ref"><v>$n</v></c>""")
    case d: java.math.BigDecimal => Some(s"""<c r="$ref"><v>${d.toPlainString}</v></c>""")
    case other => // strings, dates, timestamps, arrays… → inline string
      Some(s"""<c r="$ref" t="inlineStr"><is><t xml:space="preserve">${esc(other.toString)}</t></is></c>""")
  }

  private def sheetXml(header: Seq[String], rows: Iterator[Row]): String = {
    val sb = new StringBuilder
    sb.append("""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""")
    sb.append("""<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""")
    sb.append("""<row r="1">""")
    header.zipWithIndex.foreach { case (h, i) =>
      sb.append(cellXml(s"${colLetters(i)}1", h).get)
    }
    sb.append("</row>")
    var r = 2
    rows.foreach { row =>
      sb.append(s"""<row r="$r">""")
      (0 until row.length).foreach { i =>
        cellXml(s"${colLetters(i)}$r", row.get(i)).foreach(sb.append)
      }
      sb.append("</row>")
      r += 1
    }
    sb.append("</sheetData></worksheet>")
    sb.toString
  }

  /** S13 — write `sheets` as one .xlsx workbook, driver-side. Each frame is
    * collected; `maxRowsPerSheet` (default: the format's own hard limit)
    * refuses oversize exports LOUDLY instead of truncating — the workbook
    * is the reference's report artifact, not a bulk data sink. */
  def writeXlsx(path: String, sheets: Seq[(String, DataFrame)],
                maxRowsPerSheet: Int = SheetRowLimit - 1): Unit = {
    require(sheets.nonEmpty, "writeXlsx needs at least one sheet")
    val names = sheets.zipWithIndex.map { case ((n, _), i) => safeSheetName(n, i) }
    require(names.distinct.size == names.size,
      s"duplicate sheet names after sanitization: ${names.mkString(", ")}")
    // every schema-level check runs BEFORE the output stream opens — a
    // failed require must not leave a partial workbook on disk
    sheets.zipWithIndex.foreach { case ((_, df), i) =>
      require(df.columns.length <= SheetColLimit,
        s"sheet '${names(i)}' has ${df.columns.length} columns — the xlsx " +
        s"format caps at $SheetColLimit; export wide data as parquet/CSV")
    }
    val out = new java.util.zip.ZipOutputStream(
      new java.io.BufferedOutputStream(new java.io.FileOutputStream(path)))
    var failed = false
    def part(name: String, content: String): Unit = {
      out.putNextEntry(new java.util.zip.ZipEntry(name))
      out.write(content.getBytes("UTF-8"))
      out.closeEntry()
    }
    try {
      part("[Content_Types].xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">""" +
        """<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>""" +
        """<Default Extension="xml" ContentType="application/xml"/>""" +
        """<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>""" +
        """<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>""" +
        sheets.indices.map(i =>
          s"""<Override PartName="/xl/worksheets/sheet${i + 1}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""").mkString +
        """</Types>""")
      part("_rels/.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        """<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>""" +
        """</Relationships>""")
      part("xl/workbook.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets>""" +
        names.zipWithIndex.map { case (n, i) =>
          s"""<sheet name="${esc(n)}" sheetId="${i + 1}" r:id="rId${i + 1}"/>""" }.mkString +
        """</sheets></workbook>""")
      part("xl/_rels/workbook.xml.rels",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">""" +
        sheets.indices.map(i =>
          s"""<Relationship Id="rId${i + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${i + 1}.xml"/>""").mkString +
        s"""<Relationship Id="rId${sheets.size + 1}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>""" +
        """</Relationships>""")
      part("xl/styles.xml",
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>""" +
        """<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">""" +
        """<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>""" +
        """<fills count="1"><fill><patternFill patternType="none"/></fill></fills>""" +
        """<borders count="1"><border/></borders>""" +
        """<cellStyleXfs count="1"><xf/></cellStyleXfs>""" +
        """<cellXfs count="1"><xf xfId="0"/></cellXfs>""" +
        """</styleSheet>""")
      sheets.zipWithIndex.foreach { case ((_, df), i) =>
        // bound check BEFORE collecting rows: limit(max+1) costs one extra
        // row, not a count() job
        val rows = df.limit(maxRowsPerSheet + 1).collect()
        require(rows.length <= maxRowsPerSheet,
          s"sheet '${names(i)}' exceeds $maxRowsPerSheet rows — an xlsx " +
          "workbook is a report artifact; export bulk data as parquet/CSV")
        part(s"xl/worksheets/sheet${i + 1}.xml",
          sheetXml(df.columns.toSeq, rows.iterator))
      }
    } catch { case e: Throwable =>
      // never leave a truncated-but-openable-looking workbook behind
      failed = true
      try out.close() catch { case _: Throwable => () }
      java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(path))
      throw e
    } finally if (!failed) out.close()
  }

  /** The reference's 4-sheet Data Package (`exporter.py:7-36`):
    * Raw_Data / Clean_Data / Validation_Report / Corrections_Applied, with
    * the same placeholder sheet when no validation report exists. */
  def writeDataPackage(spark: SparkSession, path: String,
                       raw: DataFrame, clean: DataFrame,
                       validationReport: Option[DataFrame],
                       corrections: DataFrame): Unit = {
    import spark.implicits._
    val valSheet = validationReport.getOrElse(
      Seq("No validation report available").toDF("Message"))
    writeXlsx(path, Seq(
      "Raw_Data" -> raw,
      "Clean_Data" -> clean,
      "Validation_Report" -> valSheet,
      "Corrections_Applied" -> corrections))
  }
}
