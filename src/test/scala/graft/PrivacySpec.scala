package graft

import graft.operators.Privacy
import org.apache.spark.sql.functions._

/** Geometric-mechanism noise (`Privacy.geometricNoise`): the Column
  * formula against an independent BigInt model of the inverse CDF, the
  * distribution shape (mass at 0, symmetry, ε-monotonicity), and the
  * release frame contract of `noisyCounts`.
  */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  /** Independent model: md5-LE uint64 (the [[graft.functions.Sampling]]
    * contract) → exact integer inverse CDF in BigInt.
    */
  private def md5LowerLE(key: String): BigInt = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(key.getBytes("UTF-8"))
    (0 to 7).map(i => BigInt(d(8 + i) & 0xff) << (8 * i)).sum
  }

  private def modelNoise(key: String, j: Int): Long = {
    val t = BigInt(1) << 32
    val a = BigInt((1L << j) + 1)
    val u1 = (md5LowerLE(key) mod t) + 1
    val wNeg = u1 * a
    val wPos = (t - u1) * a
    def m(w: BigInt): Long =
      math.floor((32 + j - w.bitLength).toDouble / j).toLong
    val mN = m(wNeg)
    if (mN >= 1) -mN
    else if (wPos == 0) ((31 + j) / j).toLong
    else { val mP = m(wPos); if (mP >= 1) mP else 0L }
  }

  test("column noise matches the closed-form BigInt model (20k keys × j ∈ {1,2,3,8})") {
    for (j <- Seq(1, 2, 3, 8)) {
      val got = spark.range(0, 20000)
        .select(concat(lit("k"), col("id")).as("key"))
        .withColumn("noise", Privacy.geometricNoise(col("key"), j))
        .collect().map(r => r.getString(0) -> r.getLong(1))
      got.foreach { case (k, v) =>
        assert(v == modelNoise(k, j), s"key=$k j=$j spark=$v model=${modelNoise(k, j)}")
      }
    }
  }

  test("distribution shape: P(0) = (1-α)/(1+α) ± 1%, symmetric, magnitude falls with ε") {
    val n = 200000
    def draws(j: Int): Seq[Long] = (0 until n).map(i => modelNoise(s"dist$i", j))
    val byJ = Seq(1, 2, 3).map(j => j -> draws(j)).toMap
    for (j <- Seq(1, 2, 3)) {
      val d = byJ(j)
      val alpha = 1.0 / (1L << j)
      val p0 = d.count(_ == 0).toDouble / n
      assert(math.abs(p0 - (1 - alpha) / (1 + alpha)) < 0.01, s"j=$j p0=$p0")
      // symmetry: mean within ±0.02 of 0 (var(j=1) = 2α/(1-α)² = 4)
      assert(math.abs(d.sum.toDouble / n) < 0.02, s"j=$j mean drift")
    }
    val mags = Seq(1, 2, 3).map(j => byJ(j).map(x => math.abs(x)).sum.toDouble / n)
    assert(mags(0) > mags(1) && mags(1) > mags(2),
      s"mean |noise| must fall as ε grows: $mags")
  }

  test("noisyCounts: max(0,·) floor, per-(group,j) deterministic draws, true counts intact") {
    val g = Seq(("a", "x", 3L), ("b", "y", 0L)).toDF("s", "l", "n")
    val out = Privacy.noisyCounts(g, Seq("s", "l"), "n", Seq(1, 2), salt = "t")
      .collect().map(r => (r.getString(0), r.getString(1), r.getInt(2)) ->
        (r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    assert(out.size == 4)
    out.foreach { case ((s, l, j), (nTrue, noise, nNoisy)) =>
      assert(noise == modelNoise(s"t$j|$s|$l", j))
      assert(nNoisy == math.max(0L, nTrue + noise), s"($s,$l,$j)")
    }
    assert(out(("a", "x", 1))._1 == 3L && out(("b", "y", 2))._1 == 0L)
  }

  test("q_dp_histogram: contribution clamp holds (no user exceeds C=3) and totals reconcile") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts_ms", "event_id")
    val clamped = raw.select(col("user_id"), col("event_id"),
        GraftSession.eventTsMs(raw).as("ts_ms"), col("event_type"))
      .withColumn("rn", row_number().over(byUser)).filter(col("rn") <= 3)
    val perUser = clamped.groupBy("user_id").count().agg(max("count")).collect()(0).getLong(0)
    assert(perUser <= 3L)
    val got = graft.queries.LlmQueries.qDpHistogram(spark, sfDir)
      .filter(col("eps_ln2") === 1).collect()
    // the released n_clamped column sums to the clamped event total
    assert(got.map(_.getLong(2)).sum == clamped.count())
    // and every row's release respects the max(0, n + noise) floor
    got.foreach(r => assert(r.getLong(4) == math.max(0L, r.getLong(2) + r.getLong(3))))
  }
}
