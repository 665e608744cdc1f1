package graft

/** Test alias for the main-source minimal xlsx writer (moved to
  * [[graft.sources.XlsxWriter]] in r4 so Bench can generate real xlsx
  * ingest fixtures).
  */
object XlsxTestWriter {
  def build(sheets: Seq[(String, Seq[Seq[Any]])],
            partNumbering: Option[Seq[Int]] = None): Array[Byte] =
    graft.sources.XlsxWriter.build(sheets, partNumbering)
}
