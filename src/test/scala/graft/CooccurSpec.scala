package graft

import graft.operators.Cooccur
import org.apache.spark.sql.functions._

/** PMI collocations (`Cooccur.topPmiPairs`): a planted always-adjacent
  * pair ranks first, the reference model pins the pinned-division ratio,
  * and short documents contribute no bigrams.
  */
class CooccurSpec extends SparkSpec {
  import spark.implicits._

  private def run(texts: Seq[String], minCount: Long, k: Int): Seq[(String, String, Long, Double)] = {
    val out = Cooccur.topPmiPairs(texts.toDF("text"), "text", minCount, k)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getDouble(5))).toSeq
    graft.operators.Caches.release()
    out
  }

  /** Reference model of the documented ratio rule. */
  private def ref(texts: Seq[String], minCount: Long, k: Int): Seq[(String, String, Long, Double)] = {
    val toks = texts.map(_.trim.toLowerCase.split("\\s+").toSeq)
    val uni = toks.flatten.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val bis = toks.filter(_.size >= 2).flatMap(t => t.zip(t.tail))
    val m = toks.map(_.size.toLong).sum
    val nb = bis.size.toLong
    bis.groupBy(identity).toSeq
      .collect { case ((w1, w2), xs) if xs.size >= minCount =>
        val c12 = xs.size.toLong
        (w1, w2, c12, c12.toDouble / nb / uni(w1) * m / uni(w2) * m)
      }
      .sortBy { case (w1, w2, _, p) => (-p, w1, w2) }
      .take(k)
  }

  // "new york" always adjacent; filler words scattered independently
  private val corpus =
    (0 until 8).map(i => s"alpha new york beta gamma w$i alpha beta") ++
      Seq("gamma alpha", "beta gamma alpha beta", "solo")

  test("planted collocation wins and the model matches exactly") {
    val got = run(corpus, minCount = 5, k = 10)
    assert(got === ref(corpus, 5, 10))
    assert(got.head._1 === "new" && got.head._2 === "york")
  }

  test("minCount gates rare pairs; single-token docs contribute nothing") {
    // each w$i pair appears once — below minCount 5 they must all be absent
    val got = run(corpus, minCount = 5, k = 50)
    assert(!got.exists { case (w1, w2, _, _) => w1.startsWith("w") || w2.startsWith("w") })
    // "solo" only appears in a 1-token doc: never part of any pair
    assert(!got.exists { case (w1, w2, _, _) => w1 == "solo" || w2 == "solo" })
    // dropping minCount to 1 admits them, still model-exact
    assert(run(corpus, 1, 100) === ref(corpus, 1, 100))
  }

  test("topNgramsPerGroup: per-group boilerplate surfaces; short docs excluded") {
    val docs = Seq(
      ("s1", "all rights reserved footer text one"),
      ("s1", "all rights reserved footer text two"),
      ("s1", "all rights reserved something else here"),
      ("s1", "unique words only in this doc"),
      ("s2", "cookie policy accepted by the user"),
      ("s2", "cookie policy accepted again today now"),
      ("s2", "hi"), // < 3 tokens: no grams
      ("s2", "ok go")).toDF("src", "text")
    val got = Cooccur.topNgramsPerGroup(docs, "src", "text", n = 3, k = 2)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getInt(3)))
      .toSet
    assert(got.exists { case (s, g, c, r) => s == "s1" && g == "all rights reserved" && c == 3 && r == 1 })
    assert(got.exists { case (s, g, c, r) => s == "s2" && g == "cookie policy accepted" && c == 2 && r == 1 })
    // exactly k rows per group, rank 1..k, counts non-increasing by rank
    val byGroup = got.groupBy(_._1)
    assert(byGroup.forall(_._2.size == 2))
    assert(byGroup.values.forall { rows =>
      val sorted = rows.toSeq.sortBy(_._4)
      sorted.map(_._4) == Seq(1, 2) && sorted(0)._3 >= sorted(1)._3
    })
    // nothing from the short docs
    assert(!got.exists(_._2.contains("hi")))
  }
}
