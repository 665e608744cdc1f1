package graft

import graft.operators.Importance
import org.apache.spark.sql.functions._

/** DSIR-shaped importance scoring (`Importance.score`): the driver-side
  * reference model pins the md5-bucket + micro-quantized-ratio contract,
  * and the selection semantics hold — documents written in the target
  * vocabulary outscore off-target ones per token.
  */
class ImportanceSpec extends SparkSpec {
  import spark.implicits._

  private val B = 64

  private def run(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long)] = {
    val out = Importance.score(docs.toDF("doc_id", "text", "tgt"),
        "doc_id", "text", isTarget = col("tgt"), buckets = B)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    graft.operators.Caches.release()
    out
  }

  /** md5-derived uint64 mod B — Sampling.md5Bucket's documented rule. */
  private def bucket(w: String): Int = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(w.getBytes("UTF-8"))
    var x = BigInt(0)
    for (i <- 15 to 8 by -1) x = (x << 8) | (d(i) & 0xff) // little-endian of bytes 8..15
    (x % B).toInt
  }

  private def ref(docs: Seq[(Long, String, Boolean)]): Map[Long, (Long, Long)] = {
    val toks = docs.map { case (id, t, g) =>
      (id, g, t.trim.toLowerCase.split("\\s+").toSeq.map(bucket)) }
    val cB = toks.flatMap(_._3).groupBy(identity).map { case (b, xs) => b -> xs.size.toLong }
    val tB = toks.filter(_._2).flatMap(_._3).groupBy(identity)
      .map { case (b, xs) => b -> xs.size.toLong }
    val cTot = toks.map(_._3.size.toLong).sum
    val tTot = toks.filter(_._2).map(_._3.size.toLong).sum
    def w(b: Int): Long = math.floor(1e6 *
      (((tB.getOrElse(b, 0L).toDouble + 1.0) / (tTot.toDouble + B.toDouble)) /
        ((cB(b).toDouble + 1.0) / (cTot.toDouble + B.toDouble)))).toLong
    toks.map { case (id, _, bs) => id -> (bs.size.toLong, bs.map(w).sum) }.toMap
  }

  // target = docs in the "alpha/beta/gamma" vocabulary; off-target docs in a
  // disjoint one; one mixed doc
  private val corpus: Seq[(Long, String, Boolean)] = Seq(
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "beta gamma alpha gamma", true),
    (3L, "alpha beta beta gamma alpha", true),
    (4L, "rho sigma tau rho upsilon", false),
    (5L, "sigma tau upsilon rho tau", false),
    (6L, "alpha beta gamma alpha beta", false), // target-vocab text, crawl label
    (7L, "alpha beta rho sigma", false))        // half and half

  test("operator matches the reference model exactly") {
    assert(run(corpus) === ref(corpus))
  }

  test("target-vocabulary text outscores off-target per token, wherever it came from") {
    val got = run(corpus)
    def perTok(id: Long): Double = got(id)._2.toDouble / got(id)._1
    // the crawl doc written in target vocabulary scores like the target docs
    assert(perTok(6L) === perTok(1L))
    // and far above the off-target docs; the mixed doc sits between
    assert(perTok(6L) > perTok(7L) && perTok(7L) > perTok(4L))
  }
}
