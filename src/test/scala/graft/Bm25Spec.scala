package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

/** BM25 (`TfIdf.bm25`): a driver-side reference model pins the
  * micro-quantized contract, and the classic ranking properties hold —
  * more hits beat fewer at equal length, rare terms outweigh common ones,
  * and longer documents are penalized at equal tf.
  */
class Bm25Spec extends SparkSpec {
  import spark.implicits._

  private def run(docs: Seq[(Long, String)], q: Seq[String]): Map[Long, (Long, Long)] = {
    val out = TfIdf.bm25(docs.toDF("doc_id", "text"), "doc_id", "text", q)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.operators.Caches.release()
    out
  }

  /** The documented rule, verbatim: pinned double association + floor. */
  private def ref(docs: Seq[(Long, String)], q: Seq[String],
                  k1: Double = 1.2, b: Double = 0.75): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t) => id -> t.trim.toLowerCase.split("\\s+").toSeq }
    val n = docs.size.toLong
    val avgdl = toks.map(_._2.size.toLong).sum.toDouble / n
    val qs = q.distinct
    val df = qs.map(t => t -> toks.count(_._2.contains(t)).toLong).toMap
    toks.flatMap { case (id, ts) =>
      val hits = qs.filter(ts.contains)
      if (hits.isEmpty) None
      else Some(id -> (hits.size.toLong, hits.map { t =>
        val tf = ts.count(_ == t).toLong
        val idf = ((n - df(t)).toDouble + 0.5) / (df(t).toDouble + 0.5)
        val denom = tf.toDouble + k1 * ((1.0 - b) + b * (ts.size.toDouble / avgdl))
        math.floor(1e6 * (idf * (tf.toDouble * (k1 + 1.0)) / denom)).toLong
      }.sum))
    }.toMap
  }

  private val corpus = Seq(
    1L -> "spark join merge spark window",
    2L -> "filter sort table scan row",
    3L -> "spark spark spark spark spark",
    4L -> "merge window hash spark batch stream data line group sort",
    5L -> "hash hash table")

  test("operator matches the reference model; docs with no query term drop out") {
    val q = Seq("spark", "window", "hash")
    val got = run(corpus, q)
    assert(got === ref(corpus, q))
    assert(!got.contains(2L), "doc with zero query terms must not appear")
  }

  test("classic BM25 orderings hold") {
    val q = Seq("spark", "window", "hash")
    val got = run(corpus, q)
    // 3 distinct hits at short length (doc 1: spark+window ×5 tokens) beats
    // pure tf saturation on one term (doc 3: spark ×5)
    assert(got(1L)._2 > got(3L)._2)
    // rare term (hash, df=2) contributes more than common (spark, df=3):
    // doc 5 (hash tf=2, len 3) vs doc 3 (spark tf=5, len 5) — saturation
    // caps doc 3 near (k1+1)·idf while doc 5 gets the rarer idf
    assert(got(5L)._2 > got(3L)._2)
    // duplicate query terms must not double-count
    assert(run(corpus, Seq("spark", "spark", "window", "hash")) === got)
  }

  test("length normalization: same tf in a longer document scores lower") {
    val docs = Seq(
      1L -> "spark alpha",
      2L -> "spark alpha beta gamma delta epsilon zeta eta theta iota")
    val got = run(docs, Seq("spark"))
    assert(got(1L)._2 > got(2L)._2)
  }
}
