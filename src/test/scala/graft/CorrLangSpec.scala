package graft

import graft.operators.Caches
import graft.queries.LlmQueries
import org.apache.spark.sql.functions._

/** One-pass Pearson matrix and the language confusion rollup: both pinned
  * against driver-side exact-integer models (BigInt moments → the same
  * mirrored IEEE tree), bit-for-bit.
  */
class CorrLangSpec extends SparkSpec {

  test("corr matrix equals the BigInt driver model bit-for-bit on the real table") {
    val out = LlmQueries.qCorrMatrix(spark, sfDir).collect()
      .map(r => r.getString(0) -> r.getDouble(1)).toMap
    Caches.release()
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("n_chars"),
        size(graft.functions.TextFunctions.tokens(col("text"))).cast("long"),
        size(graft.functions.TextFunctions.wordSet(col("text"))).cast("long"))
      .collect().map(r => (BigInt(r.getLong(0)), BigInt(r.getLong(1)), BigInt(r.getLong(2))))
    val n = BigInt(rows.length)
    def corr(a: Seq[BigInt], b: Seq[BigInt]): Double = {
      val (sa, sb) = (a.sum, b.sum)
      val (qa, qb) = (a.map(v => v * v).sum, b.map(v => v * v).sum)
      val p = a.zip(b).map { case (x, y) => x * y }.sum
      (n * p - sa * sb).toDouble /
        (math.sqrt((n * qa - sa * sa).toDouble) * math.sqrt((n * qb - sb * sb).toDouble))
    }
    val (xs, ys, zs) = (rows.map(_._1).toSeq, rows.map(_._2).toSeq, rows.map(_._3).toSeq)
    assert(out("chars_tokens") == corr(xs, ys))
    assert(out("chars_distinct") == corr(xs, zs))
    assert(out("tokens_distinct") == corr(ys, zs))
    // sanity: chars and whitespace tokens must co-move strongly
    assert(out("chars_tokens") > 0.5)
    assert(out.values.forall(v => v >= -1.0 && v <= 1.0 + 1e-12))
  }

  test("lang confusion rollup: shares sum to 1 per labeled lang, counts match q_lang_id") {
    val m = LlmQueries.qLangMismatch(spark, sfDir).collect()
    Caches.release()
    val perLabeled = m.groupBy(_.getString(0))
    perLabeled.foreach { case (lang, rows) =>
      val share = rows.map(_.getDouble(3)).sum
      assert(math.abs(share - 1.0) < 1e-9, s"$lang shares sum to $share")
    }
    val want = LlmQueries.qLangId(spark, sfDir)
      .groupBy("labeled_lang", "detected_lang").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    Caches.release()
    val got = m.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(got == want)
  }

  test("langid calibration: bins partition the corpus, counts reconcile with q_lang_id, ppm exact") {
    val cal = LlmQueries.qLangidCalibration(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    Caches.release()
    val totalDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(cal.map(_._2).sum == totalDocs, "bins must partition the corpus")
    assert(cal.forall(b => b._1 >= 0 && b._1 <= 5))
    cal.foreach { case (_, n, c, ppm) =>
      assert(c <= n)
      assert(ppm == c * 1000000L / n, "ppm must be the exact integer division")
    }
    // total correct across bins equals the q_lang_id agreement count
    val correct = LlmQueries.qLangId(spark, sfDir)
      .filter(col("labeled_lang") === col("detected_lang")).count()
    Caches.release()
    assert(cal.map(_._3).sum == correct)
  }
}
