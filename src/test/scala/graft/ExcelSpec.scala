package graft

import org.apache.spark.sql.functions._
import graft.io.Excel

/**
 * S5 / S13 — xlsx source + sink (`file_loader.py:734-832`,
 * `exporter.py:7-36`). Round-trips through the real zip container, plus a
 * hand-built workbook exercising the sharedStrings path our writer doesn't
 * produce (externally-authored files use it heavily).
 */
class ExcelSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(name: String): String =
    java.nio.file.Files.createTempDirectory("graft-xlsx").resolve(name).toString

  test("column letters round-trip (A, Z, AA, AZ, BA, ZZ, AAA)") {
    Seq(0 -> "A", 25 -> "Z", 26 -> "AA", 51 -> "AZ", 52 -> "BA",
        701 -> "ZZ", 702 -> "AAA").foreach { case (i, s) =>
      assert(Excel.colLetters(i) === s)
      assert(Excel.colIndex(s + "7") === i)
    }
  }

  test("4-sheet data package round-trips: names, order, values, types, escaping") {
    val raw = Seq(
      ("r1", 42L, 3.5, true, "a & <b> \"c\""),
      ("r2", -7L, 0.25, false, null)
    ).toDF("id", "n_int", "n_dbl", "flag", "note")
    val clean = raw.where($"id" === "r1")
    val corrections = Seq(("note", "null standardized", 1L))
      .toDF("column", "operation", "rows_changed")
    val path = tmp("pkg.xlsx")
    Excel.writeDataPackage(spark, path, raw, clean, None, corrections)

    assert(Excel.sheetNames(path) ===
      Seq("Raw_Data", "Clean_Data", "Validation_Report", "Corrections_Applied"))
    val sheets = Excel.readAllSheets(spark, path)
    assert(sheets.keys.toSeq === Excel.sheetNames(path))

    val rawBack = sheets("Raw_Data").orderBy("id").collect()
      .map(r => (0 until r.length).map(r.getString).toList)
    assert(rawBack === Seq(
      List("r1", "42", "3.5", "True", "a & <b> \"c\""),
      List("r2", "-7", "0.25", "False", null)))
    assert(sheets("Raw_Data").columns.toSeq ===
      Seq("id", "n_int", "n_dbl", "flag", "note"))
    assert(sheets("Clean_Data").count() === 1)
    // reference placeholder when no validation report was supplied
    assert(sheets("Validation_Report").columns.toSeq === Seq("Message"))
    assert(sheets("Validation_Report").head().getString(0) ===
      "No validation report available")
    assert(sheets("Corrections_Applied").head().getString(1) === "null standardized")
  }

  test("readXlsx default is the FIRST sheet (pandas sheet_name=0); named lookup + missing-sheet error") {
    val path = tmp("two.xlsx")
    Excel.writeXlsx(path, Seq(
      "alpha" -> Seq(("x", 1)).toDF("k", "v"),
      "beta" -> Seq(("y", 2)).toDF("k", "v")))
    assert(Excel.readXlsx(spark, path).head().getString(0) === "x")
    assert(Excel.readXlsx(spark, path, Some("beta")).head().getString(0) === "y")
    val e = intercept[IllegalArgumentException](
      Excel.readXlsx(spark, path, Some("gamma")))
    assert(e.getMessage.contains("gamma"))
  }

  test("reader handles sharedStrings, sparse cells, and blank headers (externally-authored shape)") {
    // hand-built workbook: shared strings, a skipped B2 cell, a blank B1
    // header (→ pandas-style "Unnamed: 1"), and a formula-cached t="str"
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-ext")
    val path = dir.resolve("ext.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, c: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/><Override PartName="/xl/sharedStrings.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sharedStrings+xml"/></Types>""")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/sharedStrings.xml",
      """<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3"><si><t>name</t></si><si><r><t>Al</t></r><r><t>ice</t></r></si><si><t>Bob</t></si></sst>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="str"><v>score</v></c></row>""" +
      """<row r="2"><c r="A2" t="s"><v>1</v></c><c r="C2"><v>10.5</v></c></row>""" +
      """<row r="3"><c r="A3" t="s"><v>2</v></c><c r="B3"><v>7</v></c><c r="C3"><v>3</v></c></row>""" +
      """</sheetData></worksheet>""")
    zos.close()

    val df = Excel.readXlsx(spark, path)
    // blank B1 header → Unnamed: 1 (the name S10's suspicious check flags)
    assert(df.columns.toSeq === Seq("name", "Unnamed: 1", "score"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      ("Alice", null, "10.5"), // multi-run shared string concatenated; gap → null
      ("Bob", "7", "3")))      // integral numbers rendered without .0
  }

  test("reader handles cells without r attributes (position-implied), inlineStr, booleans") {
    // the `r` cell reference is OPTIONAL in SpreadsheetML; some writers emit
    // position-implied cells. Mixed here: row 2 is entirely r-less, row 3
    // anchors at B3 then continues implied (→ C3).
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-norefs")
    val path = dir.resolve("norefs.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, c: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><sheets><sheet name="Data" sheetId="1" r:id="rId1"/></sheets></workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      """<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><sheetData>""" +
      """<row r="1"><c t="inlineStr"><is><t>k</t></is></c><c t="inlineStr"><is><t>flag</t></is></c><c t="inlineStr"><is><t>v</t></is></c></row>""" +
      """<row r="2"><c t="inlineStr"><is><t>a</t></is></c><c t="b"><v>1</v></c><c><v>2.5</v></c></row>""" +
      """<row r="3"><c r="B3" t="b"><v>0</v></c><c><v>9</v></c></row>""" +
      """</sheetData></worksheet>""")
    zos.close()

    val df = Excel.readXlsx(spark, path)
    assert(df.columns.toSeq === Seq("k", "flag", "v"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows.toSeq === Seq(
      ("a", "True", "2.5"),
      (null, "False", "9"))) // B3 anchor, next implied cell lands in C3
  }

  test("reader handles namespace-PREFIXED SpreadsheetML (<x:sheet>, <x:row>)") {
    // valid OOXML producers may prefix the main namespace instead of
    // defaulting it; lookups must match by local name
    val dir = java.nio.file.Files.createTempDirectory("graft-xlsx-ns")
    val path = dir.resolve("ns.xlsx").toString
    val zos = new java.util.zip.ZipOutputStream(new java.io.FileOutputStream(path))
    def part(n: String, c: String): Unit = {
      zos.putNextEntry(new java.util.zip.ZipEntry(n))
      zos.write(c.getBytes("UTF-8")); zos.closeEntry()
    }
    part("[Content_Types].xml",
      """<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types"><Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/><Default Extension="xml" ContentType="application/xml"/><Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/><Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/></Types>""")
    part("_rels/.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/></Relationships>""")
    part("xl/workbook.xml",
      """<x:workbook xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:rel="http://schemas.openxmlformats.org/officeDocument/2006/relationships"><x:sheets><x:sheet name="Data" sheetId="1" rel:id="rId1"/></x:sheets></x:workbook>""")
    part("xl/_rels/workbook.xml.rels",
      """<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships"><Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/></Relationships>""")
    part("xl/worksheets/sheet1.xml",
      """<x:worksheet xmlns:x="http://schemas.openxmlformats.org/spreadsheetml/2006/main"><x:sheetData>""" +
      """<x:row r="1"><x:c r="A1" t="inlineStr"><x:is><x:t>h</x:t></x:is></x:c></x:row>""" +
      """<x:row r="2"><x:c r="A2"><x:v>7</x:v></x:c></x:row>""" +
      """</x:sheetData></x:worksheet>""")
    zos.close()
    assert(Excel.sheetNames(path) === Seq("Data"))
    val df = Excel.readXlsx(spark, path)
    assert(df.columns.toSeq === Seq("h"))
    assert(df.head().getString(0) === "7")
  }

  test("writer: NaN becomes a blank cell, Infinity an inline string (never an invalid numeric)") {
    val df = Seq(
      ("r1", Double.NaN),
      ("r2", Double.PositiveInfinity),
      ("r3", 1.5)
    ).toDF("id", "v")
    val path = tmp("nan.xlsx")
    Excel.writeXlsx(path, Seq("s" -> df))
    // no raw NaN/Infinity numeric cells in the sheet XML
    val z = new java.util.zip.ZipFile(path)
    val xmlText = try {
      val in = z.getInputStream(z.getEntry("xl/worksheets/sheet1.xml"))
      try new String(in.readAllBytes(), "UTF-8") finally in.close()
    } finally z.close()
    assert(!xmlText.contains("<v>NaN</v>") && !xmlText.contains("<v>Infinity</v>"))
    val back = Excel.readXlsx(spark, path).orderBy("id").collect()
      .map(r => (r.getString(0), r.getString(1)))
    assert(back.toSeq === Seq(("r1", null), ("r2", "Infinity"), ("r3", "1.5")))
  }

  test("writer refuses oversize sheets loudly (report artifact, not a data sink)") {
    val big = spark.range(0, 50).toDF("id")
    val e = intercept[IllegalArgumentException](
      Excel.writeXlsx(tmp("big.xlsx"), Seq("s" -> big), maxRowsPerSheet = 10))
    assert(e.getMessage.contains("exceeds"))
  }
}
