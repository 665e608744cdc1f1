package graft

import graft.operators.LineDedup

/** Line-grain dedup (`LineDedup`): first-occurrence winners, short-line
  * exemption, within-doc repeats, empty reassembly, and order
  * preservation.
  */
class LineDedupSpec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], minLen: Int = 10): Map[Long, (String, Int, Int)] =
    LineDedup.dedupLines(docs.toDF("doc_id", "text"), "doc_id", "text", minLen)
      .collect().map(r => r.getLong(0) -> ((r.getString(1), r.getInt(2), r.getInt(3)))).toMap

  test("a duplicated long line survives only at its first (doc, idx) occurrence") {
    val got = run(Seq(
      1L -> "unique alpha body line\nCOPYRIGHT FOOTER BOILERPLATE",
      2L -> "unique beta body line\nCOPYRIGHT FOOTER BOILERPLATE",
      3L -> "COPYRIGHT FOOTER BOILERPLATE\nunique gamma body line"))
    assert(got(1L) === (("unique alpha body line\nCOPYRIGHT FOOTER BOILERPLATE", 2, 0)))
    assert(got(2L) === (("unique beta body line", 1, 1)))
    assert(got(3L) === (("unique gamma body line", 1, 1)))
  }

  test("short lines are exempt: duplicates below minLen are kept everywhere") {
    val got = run(Seq(
      1L -> "Yes.\nfirst long body line here",
      2L -> "Yes.\nsecond long body line here"))
    assert(got(1L) === (("Yes.\nfirst long body line here", 2, 0)))
    assert(got(2L) === (("Yes.\nsecond long body line here", 2, 0)))
  }

  test("a line repeated WITHIN one document keeps only its first occurrence") {
    val got = run(Seq(
      7L -> "repeated long line content\nmiddle unique line text\nrepeated long line content"))
    assert(got(7L) === (("repeated long line content\nmiddle unique line text", 2, 1)))
  }

  test("a document whose every line is dropped reassembles to the empty string") {
    val got = run(Seq(
      1L -> "the only long line in this corpus",
      2L -> "the only long line in this corpus"))
    assert(got(1L) === (("the only long line in this corpus", 1, 0)))
    assert(got(2L) === (("", 0, 1)))
  }

  test("surviving lines keep original order; trimming matches on padded copies") {
    val got = run(Seq(
      1L -> "zebra line comes first here\napple line comes second here",
      // padded copy of doc 1's second line: trims equal, so it dedups away
      2L -> "  apple line comes second here  \nits own unique body line"))
    assert(got(1L)._1 === "zebra line comes first here\napple line comes second here")
    assert(got(2L) === (("its own unique body line", 1, 1)))
  }

  test("rejects a non-positive minLen") {
    val e = intercept[IllegalArgumentException] { run(Seq(1L -> "x"), minLen = 0) }
    assert(e.getMessage.contains("minLen"))
  }
}
