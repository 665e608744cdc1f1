package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Test-only minimal xlsx writer (zip of hand-built XML parts) so the
  * ExcelSource binary path can be exercised without any Excel library.
  */
object XlsxTestWriter {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  private def colName(idx: Int): String = {
    var i = idx; val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  /** Cells: String → shared string; Number → inline numeric; null → gap. */
  def build(sheets: Seq[(String, Seq[Seq[Any]])]): Array[Byte] = {
    val sharedIdx = scala.collection.mutable.LinkedHashMap[String, Int]()
    def sharedRef(s: String): Int = sharedIdx.getOrElseUpdate(s, sharedIdx.size)

    val sheetXmls = sheets.map { case (_, rows) =>
      val rowsXml = rows.zipWithIndex.map { case (cells, r) =>
        val cellsXml = cells.zipWithIndex.collect {
          case (v, c) if v != null =>
            val ref = s"${colName(c + 1)}${r + 1}"
            v match {
              case s: String => s"""<c r="$ref" t="s"><v>${sharedRef(s)}</v></c>"""
              case n         => s"""<c r="$ref"><v>$n</v></c>"""
            }
        }.mkString
        s"""<row r="${r + 1}">$cellsXml</row>"""
      }.mkString
      s"""<?xml version="1.0"?><worksheet><sheetData>$rowsXml</sheetData></worksheet>"""
    }

    val workbook =
      s"""<?xml version="1.0"?><workbook><sheets>${
        sheets.zipWithIndex.map { case ((n, _), i) => s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}"/>""" }.mkString
      }</sheets></workbook>"""
    val sst =
      s"""<?xml version="1.0"?><sst>${
        sharedIdx.keys.map(s => s"<si><t>${xmlEscape(s)}</t></si>").mkString
      }</sst>"""

    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    def put(name: String, content: String): Unit = {
      zos.putNextEntry(new ZipEntry(name))
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    put("xl/workbook.xml", workbook)
    put("xl/sharedStrings.xml", sst)
    sheetXmls.zipWithIndex.foreach { case (xml, i) => put(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    zos.close()
    bos.toByteArray
  }
}
