package graft.sinks

import java.io.FileOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.{ZipEntry, ZipOutputStream}

import org.apache.spark.sql.DataFrame

/** Dependency-free styled-xlsx adapter for the audit report — the literal
  * K2 artifact (`Job Cek Script/app.py:222-291`: merged+filled header row,
  * per-column widths, status-keyed fill colors, thin borders) closing the
  * §7.5 "Excel styling" divergence without external libraries: an xlsx is a
  * zip of XML parts, written here over `java.util.zip`.
  *
  * Presentation stays data-driven: the fill of each row comes from the
  * report's `color` column (computed by the Audit's T13 map lookup), the
  * writer just maps color names to ARGB fills. Strings are inline
  * (`t="inlineStr"`), so no sharedStrings part is needed.
  *
  * Driver-side collect is deliberate and bounded: a report is a human
  * artifact (one row per project), same rationale as ReportSink.writeCsv's
  * coalesce(1).
  */
object XlsxWriter {

  // status fills (ARGB): the classic "good/bad/neutral" conditional-format
  // palette + a header accent
  private val Fills: Seq[(String, String)] = Seq(
    "green" -> "FFC6EFCE", "red" -> "FFFFC7CE",
    "yellow" -> "FFFFEB9C", "grey" -> "FFD9D9D9",
    "header" -> "FF9BC2E6")
  private val FillIdx: Map[String, Int] =
    Fills.zipWithIndex.map { case ((n, _), i) => n -> (i + 2) }.toMap // 0,1 reserved

  private def esc(s: String): String = {
    val markup = s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;").replace("'", "&apos;")
    // XML 1.0 forbids most C0 controls even escaped — a single stray
    // U+0007 in a report string makes Excel reject the whole workbook.
    // Excel's own convention is _xHHHH_ encoding; escape a literal
    // _xHHHH_ already present in the text so decoding stays reversible.
    val guarded = markup.replaceAll("_x([0-9A-Fa-f]{4})_", "_x005F_x$1_")
    val b = new StringBuilder(guarded.length)
    guarded.foreach { c =>
      if (c == '\t' || c == '\n' || c == '\r' || (c >= 0x20 && c != 0xFFFE && c != 0xFFFF)) b.append(c)
      else b.append(f"_x${c.toInt}%04X_")
    }
    b.toString
  }

  private def colLetter(i: Int): String = {
    var n = i; var s = ""
    while (n >= 0) { s = ('A' + n % 26).toChar.toString + s; n = n / 26 - 1 }
    s
  }

  /** cellXfs: 0 = default, 1 = bordered, 2.. = bordered + fill in Fills
    * order — so a color's style id equals its fill id. Plain bordered when
    * the color is unknown/absent. */
  private def styleId(color: String): Int = FillIdx.getOrElse(color, 1)

  private val stylesXml: String = {
    val fillXml = Fills.map { case (_, argb) =>
      s"""<fill><patternFill patternType="solid"><fgColor rgb="$argb"/><bgColor indexed="64"/></patternFill></fill>"""
    }.mkString
    val xfs = Seq("""<xf numFmtId="0" fontId="0" fillId="0" borderId="0"/>""",
      """<xf numFmtId="0" fontId="0" fillId="0" borderId="1" applyBorder="1"/>""") ++
      Fills.indices.map(i =>
        s"""<xf numFmtId="0" fontId="0" fillId="${i + 2}" borderId="1" applyBorder="1" applyFill="1"/>""")
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |<fonts count="1"><font><sz val="11"/><name val="Calibri"/></font></fonts>
       |<fills count="${Fills.size + 2}"><fill><patternFill patternType="none"/></fill>
       |<fill><patternFill patternType="gray125"/></fill>$fillXml</fills>
       |<borders count="2"><border><left/><right/><top/><bottom/><diagonal/></border>
       |<border><left style="thin"/><right style="thin"/><top style="thin"/><bottom style="thin"/><diagonal/></border></borders>
       |<cellStyleXfs count="1"><xf numFmtId="0" fontId="0" fillId="0" borderId="0"/></cellStyleXfs>
       |<cellXfs count="${xfs.size}">${xfs.mkString}</cellXfs>
       |</styleSheet>""".stripMargin
  }

  /** Writes the ordered report as a single styled workbook at `path`
    * (a `.xlsx` file). Layout mirrors the reference's sheet: row 1 = merged
    * filled title, row 2 = column headers, then one bordered row per
    * project filled by its `color` column. */
  def writeXlsx(report: DataFrame, path: String,
                title: String = "Daily Job Check"): Unit = {
    val cols = report.columns
    val colorIdx = cols.indexOf("color")
    val numeric = report.schema.fields.map(f =>
      f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType])
    val rows = report.orderBy("seq").collect()

    def cell(ref: String, v: String, style: Int): String =
      s"""<c r="$ref" s="$style" t="inlineStr"><is><t xml:space="preserve">${esc(v)}</t></is></c>"""
    // numeric columns get real number cells, so spreadsheet sorting and
    // formulas work on them (seq, counts)
    def numCell(ref: String, v: String, style: Int): String =
      s"""<c r="$ref" s="$style"><v>$v</v></c>"""

    val headerRow = {
      val cs = cols.indices.map(i =>
        cell(s"${colLetter(i)}1", if (i == 0) title else "", styleId("header")))
      s"""<row r="1">${cs.mkString}</row>"""
    }
    val nameRow = {
      val cs = cols.zipWithIndex.map { case (n, i) =>
        cell(s"${colLetter(i)}2", n, 1)
      }
      s"""<row r="2">${cs.mkString}</row>"""
    }
    val dataRows = rows.zipWithIndex.map { case (r, ri) =>
      val color = if (colorIdx >= 0 && !r.isNullAt(colorIdx)) r.getString(colorIdx) else ""
      val s = styleId(color)
      val cs = cols.indices.map { ci =>
        val ref = s"${colLetter(ci)}${ri + 3}"
        if (r.isNullAt(ci)) cell(ref, "", s)
        else if (numeric(ci)) {
          // NaN/Infinity are not valid <v> number content — Excel rejects
          // the sheet; degrade those to inline strings
          val v = r.get(ci).toString
          val finite = v match {
            case "NaN" | "Infinity" | "-Infinity" => false
            case _ => true
          }
          if (finite) numCell(ref, v, s) else cell(ref, v, s)
        }
        else cell(ref, r.get(ci).toString, s)
      }
      s"""<row r="${ri + 3}">${cs.mkString}</row>"""
    }

    // column widths from content (reference sets explicit per-column widths)
    val widths = cols.indices.map { ci =>
      val maxLen = (cols(ci).length +: rows.map(r =>
        if (r.isNullAt(ci)) 0 else r.get(ci).toString.length)).max
      math.min(maxLen + 2, 60)
    }
    val colsXml = widths.zipWithIndex.map { case (w, i) =>
      s"""<col min="${i + 1}" max="${i + 1}" width="$w" customWidth="1"/>"""
    }.mkString

    val sheetXml =
      s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
         |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
         |<cols>$colsXml</cols>
         |<sheetData>$headerRow$nameRow${dataRows.mkString}</sheetData>
         |<mergeCells count="1"><mergeCell ref="A1:${colLetter(cols.length - 1)}1"/></mergeCells>
         |</worksheet>""".stripMargin

    val parts: Seq[(String, String)] = Seq(
      "[Content_Types].xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
          |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
          |<Default Extension="xml" ContentType="application/xml"/>
          |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
          |<Override PartName="/xl/worksheets/sheet1.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>
          |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
          |</Types>""".stripMargin,
      "_rels/.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
          |</Relationships>""".stripMargin,
      "xl/workbook.xml" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
          |<sheets><sheet name="summary_job" sheetId="1" r:id="rId1"/></sheets>
          |</workbook>""".stripMargin,
      "xl/_rels/workbook.xml.rels" ->
        """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
          |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
          |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
          |<Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>
          |</Relationships>""".stripMargin,
      "xl/styles.xml" -> stylesXml,
      "xl/worksheets/sheet1.xml" -> sheetXml)

    val zos = new ZipOutputStream(new FileOutputStream(path))
    try parts.foreach { case (name, content) =>
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes(StandardCharsets.UTF_8))
      zos.closeEntry()
    } finally zos.close()
  }
}
