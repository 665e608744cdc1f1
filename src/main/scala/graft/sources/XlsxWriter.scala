package graft.sources

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

/** Minimal xlsx writer (zip of hand-built XML parts): enough of the
  * SpreadsheetML surface for fixtures and round-trip tests of
  * [[ExcelSource]] — no Excel library exists in this environment. Strings
  * intern into the shared-string table like real writers; numbers inline;
  * nulls become cell gaps.
  */
object XlsxWriter {

  private def xmlEscape(s: String): String =
    s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;").replace("\"", "&quot;")

  def colName(idx: Int): String = {
    var i = idx; val sb = new StringBuilder
    while (i > 0) { val r = (i - 1) % 26; sb.insert(0, ('A' + r).toChar); i = (i - 1) / 26 }
    sb.toString
  }

  /** Cells: String → shared string; Number → inline numeric; null → gap.
    *
    * @param partNumbering worksheet part number per sheet (sheet i stored as
    *                      `sheetN.xml` with N = partNumbering(i)), wired up
    *                      through r:id + workbook.xml.rels like real writers
    *                      do — pass a permutation that disagrees with the
    *                      workbook order to exercise the rels join. None →
    *                      minimal workbook with no rels (the fallback path).
    */
  def build(sheets: Seq[(String, Seq[Seq[Any]])],
            partNumbering: Option[Seq[Int]] = None): Array[Byte] = {
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
        sheets.zipWithIndex.map { case ((n, _), i) =>
          val rid = if (partNumbering.isDefined) s""" r:id="rId${i + 1}"""" else ""
          s"""<sheet name="${xmlEscape(n)}" sheetId="${i + 1}"$rid/>"""
        }.mkString
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
    partNumbering match {
      case Some(nums) =>
        require(nums.size == sheets.size)
        val rels = nums.zipWithIndex.map { case (n, i) =>
          s"""<Relationship Id="rId${i + 1}" Target="worksheets/sheet$n.xml"/>"""
        }.mkString
        put("xl/_rels/workbook.xml.rels", s"""<?xml version="1.0"?><Relationships>$rels</Relationships>""")
        sheetXmls.zip(nums).foreach { case (xml, n) => put(s"xl/worksheets/sheet$n.xml", xml) }
      case None =>
        sheetXmls.zipWithIndex.foreach { case (xml, i) => put(s"xl/worksheets/sheet${i + 1}.xml", xml) }
    }
    zos.close()
    bos.toByteArray
  }
}
