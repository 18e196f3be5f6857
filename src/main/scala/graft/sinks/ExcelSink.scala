package graft.sinks

import java.io.FileOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}
import org.apache.spark.sql.DataFrame

/** K2 — Excel workbook sink (src/sinks/excel/index.ts:9-69) written as
  * a minimal OOXML .xlsx directly through java.util.zip — no external
  * spreadsheet dependency (zero-egress build).
  *
  * Reference semantics preserved: sheet per table with sheet names
  * SORTED; header row from the first row's column names, bold on a grey
  * (FFE0E0E0) solid fill; null → ''; minimum column width 15; empty
  * tables still get an (empty) sheet.
  *
  * Driver-side by design: derived tables are dimension-sized (≪10⁶
  * rows). The 100 TB path is the parquet/JSONL sinks; Excel is a human
  * hand-off format.
  */
object ExcelSink {

  def write(tables: Map[String, DataFrame], outputPath: String): Unit = {
    val names = tables.keys.toSeq.sorted
    val sheets = names.zipWithIndex.map { case (name, i) =>
      val df = tables(name)
      val cols = df.columns.toSeq
      val rows = df.collect().map(r => cols.indices.map(j => Option(r.get(j))))
      SheetData(name, i + 1, cols, rows.toSeq)
    }
    val parent = new java.io.File(outputPath).getParentFile
    if (parent != null) parent.mkdirs()
    val zip = new ZipOutputStream(new FileOutputStream(outputPath))
    try {
      put(zip, "[Content_Types].xml", contentTypes(sheets))
      put(zip, "_rels/.rels", rootRels)
      put(zip, "xl/workbook.xml", workbookXml(sheets))
      put(zip, "xl/_rels/workbook.xml.rels", workbookRels(sheets))
      put(zip, "xl/styles.xml", stylesXml)
      sheets.foreach(s => put(zip, s"xl/worksheets/sheet${s.index}.xml", sheetXml(s)))
    } finally zip.close()
  }

  private case class SheetData(name: String, index: Int, cols: Seq[String],
                               rows: Seq[Seq[Option[Any]]])

  private def put(zip: ZipOutputStream, path: String, content: String): Unit = {
    zip.putNextEntry(new ZipEntry(path))
    zip.write(content.getBytes("UTF-8"))
    zip.closeEntry()
  }

  private def esc(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")
      .replace("\"", "&quot;")

  /** A, B, …, Z, AA, AB, … */
  def colLetter(i: Int): String = {
    var n = i + 1
    val sb = new StringBuilder
    while (n > 0) {
      val r = (n - 1) % 26
      sb.insert(0, ('A' + r).toChar)
      n = (n - 1) / 26
    }
    sb.toString
  }

  private def cellXml(ref: String, v: Option[Any], styleId: Int): String = {
    val s = if (styleId > 0) s""" s="$styleId"""" else ""
    v match {
      case None => s"""<c r="$ref"$s t="inlineStr"><is><t></t></is></c>"""
      case Some(n: Number) => s"""<c r="$ref"$s><v>$n</v></c>"""
      case Some(b: Boolean) => s"""<c r="$ref"$s t="b"><v>${if (b) 1 else 0}</v></c>"""
      case Some(x) =>
        s"""<c r="$ref"$s t="inlineStr"><is><t xml:space="preserve">${esc(x.toString)}</t></is></c>"""
    }
  }

  private def sheetXml(s: SheetData): String = {
    val colsXml =
      if (s.cols.isEmpty) ""
      else s.cols.indices.map(i =>
        s"""<col min="${i + 1}" max="${i + 1}" width="15" customWidth="1"/>""")
        .mkString("<cols>", "", "</cols>")
    val header =
      if (s.cols.isEmpty) """<row r="1"/>"""
      else s.cols.zipWithIndex.map { case (c, i) =>
        cellXml(s"${colLetter(i)}1", Some(c), styleId = 1)
      }.mkString(s"""<row r="1">""", "", "</row>")
    val data = s.rows.zipWithIndex.map { case (r, ri) =>
      r.zipWithIndex.map { case (v, ci) =>
        cellXml(s"${colLetter(ci)}${ri + 2}", v, styleId = 0)
      }.mkString(s"""<row r="${ri + 2}">""", "", "</row>")
    }.mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
       |$colsXml<sheetData>$header$data</sheetData></worksheet>""".stripMargin
  }

  /** Style 1 = bold font on solid FFE0E0E0 fill (the reference's header
    * style, excel/index.ts:38-44). */
  private val stylesXml: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<styleSheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
      |<fonts count="2"><font/><font><b/></font></fonts>
      |<fills count="3"><fill><patternFill patternType="none"/></fill>
      |<fill><patternFill patternType="gray125"/></fill>
      |<fill><patternFill patternType="solid"><fgColor rgb="FFE0E0E0"/></patternFill></fill></fills>
      |<borders count="1"><border/></borders>
      |<cellStyleXfs count="1"><xf/></cellStyleXfs>
      |<cellXfs count="2"><xf xfId="0"/><xf xfId="0" fontId="1" fillId="2" applyFont="1" applyFill="1"/></cellXfs>
      |</styleSheet>""".stripMargin

  private def contentTypes(sheets: Seq[SheetData]): String = {
    val overrides = sheets.map(s =>
      s"""<Override PartName="/xl/worksheets/sheet${s.index}.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.worksheet+xml"/>""")
      .mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
       |<Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
       |<Default Extension="xml" ContentType="application/xml"/>
       |<Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
       |<Override PartName="/xl/styles.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.styles+xml"/>
       |$overrides</Types>""".stripMargin
  }

  private val rootRels: String =
    """<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
      |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
      |<Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
      |</Relationships>""".stripMargin

  private def workbookXml(sheets: Seq[SheetData]): String = {
    val entries = sheets.map(s =>
      s"""<sheet name="${esc(s.name)}" sheetId="${s.index}" r:id="rIdS${s.index}"/>""").mkString
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
       | xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
       |<sheets>$entries</sheets></workbook>""".stripMargin
  }

  private def workbookRels(sheets: Seq[SheetData]): String = {
    val entries = sheets.map(s =>
      s"""<Relationship Id="rIdS${s.index}" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet${s.index}.xml"/>""")
      .mkString
    val styles = """<Relationship Id="rIdStyles" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/styles" Target="styles.xml"/>"""
    s"""<?xml version="1.0" encoding="UTF-8" standalone="yes"?>
       |<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
       |$entries$styles</Relationships>""".stripMargin
  }
}
