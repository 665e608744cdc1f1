package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** Variable-length exact substring dedup (`Dedup.removeRepeatedSubstrings`,
  * Lee et al. 2022 semantics at gram granularity): a driver-side reference
  * model pins the exact rule, planted fixtures prove the fixed-width
  * grid's blind spot is covered, and the keep-first / soundness guarantees
  * are asserted both on fixtures and on the real documents table.
  */
class SubstrDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = 10

  /** Reference model of the operator's documented rule, O(corpus²)-naive. */
  private def substrRef(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) =>
      id -> t.trim.toLowerCase.split("\\s+").filter(_.nonEmpty).toSeq
    }.toMap
    // all gram occurrences, grouped by gram content
    val occ = docs.flatMap { case (id, _) =>
      val ts = toks(id)
      (0 to ts.length - L).map(j => (ts.slice(j, j + L).mkString(" "), id, j))
    }.groupBy(_._1).values
    val removedByDoc = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    val rescuedByDoc = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Int]]()
    for (os <- occ if os.size >= 2) {
      val sorted = os.sortBy(o => (o._2, o._3))
      val (_, wid, wpos) = sorted.head
      (wpos until wpos + L).foreach(
        rescuedByDoc.getOrElseUpdate(wid, scala.collection.mutable.Set()) += _)
      sorted.tail.foreach { case (_, id, p) =>
        (p until p + L).foreach(
          removedByDoc.getOrElseUpdate(id, scala.collection.mutable.Set()) += _)
      }
    }
    docs.map { case (id, _) =>
      val ts = toks(id)
      val rem = removedByDoc.getOrElse(id, Set.empty[Int])
      val res = rescuedByDoc.getOrElse(id, Set.empty[Int])
      val kept = ts.indices.filter(i => !rem.contains(i) || res.contains(i))
      (id, (ts.length.toLong, kept.size.toLong, kept.map(ts).mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, (Long, Long, String)] = {
    val out = Dedup.removeRepeatedSubstrings(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getString(3)))).toMap
    graft.operators.Caches.release()
    out
  }

  private def words(prefix: String, n: Int): Seq[String] = (0 until n).map(i => s"$prefix$i")

  test("operator equals the reference model on planted fixtures") {
    val phrase = words("p", 12) // a 12-token phrase: longer than L, arbitrary offsets
    val docs = Seq(
      1L -> (words("a", 7) ++ phrase ++ words("b", 5)).mkString(" "),   // phrase at offset 7
      2L -> (words("c", 3) ++ phrase ++ words("d", 9)).mkString(" "),   // phrase at offset 3
      3L -> words("e", 25).mkString(" "),                               // unique
      4L -> "",                                                         // empty
      5L -> words("f", 6).mkString(" "))                                // shorter than L
    val got = run(docs)
    val ref = substrRef(docs)
    assert(got == ref, s"got $got\nref $ref")
    // doc 1 (first occurrence) intact; doc 2 lost exactly the 12 phrase tokens
    assert(got(1L) == ((24L, 24L, docs.head._2.toLowerCase)))
    assert(got(2L)._1 == 24L && got(2L)._2 == 12L)
    assert(got(2L)._3 == (words("c", 3) ++ words("d", 9)).mkString(" "))
    // unique, empty and short docs untouched
    assert(got(3L) == ((25L, 25L, docs(2)._2)))
    assert(got(4L) == ((0L, 0L, "")))
    assert(got(5L) == ((6L, 6L, docs(4)._2)))
  }

  test("misaligned repeats: the fixed-width grid misses what the sliding grams catch") {
    // the same 10-token phrase at aligned offset 0 in doc 1 and MISALIGNED
    // offset 3 in doc 2: width-10 span dedup sees two different aligned
    // blocks (no block repeats), substring dedup removes the copy
    val phrase = words("p", 10)
    val docs = Seq(
      1L -> phrase.mkString(" "),
      2L -> (words("x", 3) ++ phrase ++ words("y", 7)).mkString(" "))
    val span = Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap // n_kept spans
    val sub = run(docs)
    assert(span(2L) == 2L, "span dedup keeps both aligned blocks of doc 2 (the miss)")
    assert(sub(2L)._2 == 10L && sub(2L)._3 == (words("x", 3) ++ words("y", 7)).mkString(" "),
      s"substring dedup must remove the misaligned copy: ${sub(2L)}")
    assert(sub(1L)._2 == 10L, "first occurrence intact")
  }

  test("any-length repeats: a 30-token region removes whole, not just one grid block") {
    val region = words("r", 30)
    val docs = Seq(
      1L -> region.mkString(" "),
      2L -> (words("u", 4) ++ region ++ words("v", 4)).mkString(" "))
    val got = run(docs)
    assert(got(1L)._2 == 30L)
    assert(got(2L)._2 == 8L && got(2L)._3 == (words("u", 4) ++ words("v", 4)).mkString(" "))
  }

  test("keep-first and soundness on the real documents table (vs reference model)") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").orderBy("doc_id").limit(120)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSeq
    val got = run(docs)
    val ref = substrRef(docs)
    assert(got == ref, {
      val bad = got.keys.filter(k => got(k) != ref(k)).take(3)
      s"mismatch on docs $bad: ${bad.map(k => (got(k), ref(k)))}"
    })
    // soundness: some text survives, and nothing is removed from docs
    // whose grams are all unique (n_kept == n_tokens there)
    assert(got.values.map(_._2).sum > 0)
  }

  test("fixed-width span dedup's removals are a subset on block-structured duplication") {
    // aligned whole-block duplication (the only shape the fixed grid
    // catches): every position the span method removes, the substring
    // method removes too — the ⊇ containment of the verdict's criterion
    val block = words("b", 10)
    val docs = Seq(
      1L -> (block ++ words("m", 10)).mkString(" "),
      2L -> (words("n", 10) ++ block).mkString(" "),      // block at aligned offset 10
      3L -> (block ++ block).mkString(" "))               // self-repetition
    val span = Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", L)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3))).toMap
    val sub = run(docs)
    graft.operators.Caches.release()
    for (id <- docs.map(_._1)) {
      val spanKept = span(id)._3.split(" ").filter(_.nonEmpty).toSeq
      val subKept = sub(id)._3.split(" ").filter(_.nonEmpty).toSeq
      // substring-kept tokens ⊆ span-kept tokens (= removals ⊇), as multisets
      val spanCounts = spanKept.groupBy(identity).view.mapValues(_.size).toMap
      subKept.groupBy(identity).foreach { case (t, xs) =>
        assert(spanCounts.getOrElse(t, 0) >= xs.size,
          s"doc $id keeps '$t' under substring dedup but span dedup removed it")
      }
    }
    // and strictly more is removed for doc 3's tail overlap
    assert(sub(3L)._2 <= span(3L)._2 * 10)
  }
}
