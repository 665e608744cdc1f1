package graft

import graft.operators.Snm

/** Sorted-neighborhood dedup ([[graft.operators.Snm]]): window semantics
  * on a planted ordering, the locality limitation that defines the
  * method, and a full driver model on the real table.
  */
class SnmSpec extends SparkSpec {
  import spark.implicits._

  private def wordSet(t: String): Set[String] =
    t.trim.toLowerCase.split("\\s+").toSet
  private def jac(a: String, b: String): Double = {
    val (wa, wb) = (wordSet(a), wordSet(b))
    (wa & wb).size.toDouble / (wa | wb).size.toDouble
  }

  test("window-adjacent near-dups pair; the same pair outside the window is missed") {
    // keys sort as: "aaa ..."(1), "aab ..."(2), then zz-fillers, then "zzz twin"(9,10)
    val docs = Seq(
      (1L, "aaa common words here and more filler tokens"),
      (2L, "aab common words here and more filler tokens"),
      (3L, "ccc unrelated"), (4L, "ddd unrelated"), (5L, "eee unrelated"),
      (6L, "fff unrelated"),
      // same CONTENT as doc 1 but prefix sorts it > 3 ranks away: SNM misses it
      (7L, "zzz common words here and more filler tokens")
    ).toDF("doc_id", "text")
    val got = Snm.snmPairs(docs, "doc_id", "text", window = 4, minJaccard = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(got.contains((1L, 2L)))
    assert(!got.exists(p => p == ((1L, 7L)) || p == ((7L, 1L))),
      "a pair 6 ranks apart must be OUTSIDE the w=4 window — that locality bound is the method")
  }

  test("q_snm_dedup matches a driver model exactly") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    val key = docs.map { case (id, t) =>
      (id, t, t.trim.toLowerCase.replaceAll("\\s+", " ").take(24))
    }
    val ranked = key.sortBy { case (id, _, k) => (k, id) }.zipWithIndex
    val want = (for {
      ((ia, ta, _), ra) <- ranked
      ((ib, tb, _), rb) <- ranked
      if rb > ra && rb <= ra + 3
      j = jac(ta, tb) if j >= 0.5
    } yield (ia, ib, j)).sortBy(p => (p._1, p._2)).toSeq
    val got = graft.queries.LlmQueries.qSnmDedup(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got === want)
    assert(got.nonEmpty, "the corpus plants near-dups; the prefix pass must find some")
  }
}
