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

  /** Independent BigInt model of the truncated exponential-mechanism
    * median: same grid/weights/inverse-CDF as Privacy.dpMedianByGroup.
    */
  private def modelDpMedian(values: Seq[Long], key: String, j: Int): Long = {
    val grid = values.groupBy(identity).map { case (v, xs) => v -> xs.size.toLong }
      .toSeq.sortBy(_._1)
    val n = values.size.toLong
    var less = 0L
    val rows = grid.map { case (v, cnt) =>
      val u = math.max(0L, math.max(2 * less + 1 - n, n + 1 - 2 * (less + cnt)))
      val w = if (62 - j * u >= 0) BigInt(1) << (62 - j * u).toInt else BigInt(0)
      less += cnt
      (v, w)
    }
    val tot = rows.map(_._2).sum
    val u32 = (md5LowerLE(key) mod (BigInt(1) << 32))
    var cum = BigInt(0)
    rows.find { case (_, w) => cum += w; cum * (BigInt(1) << 32) > u32 * tot }
      .map(_._1).get
  }

  test("dpMedianByGroup ≡ the BigInt exponential-mechanism model; truth column exact") {
    val rows = ((1 to 9).map(v => ("g1", v.toLong)) ++
      (Seq(1L, 1L, 1L, 2L, 50L) map (("g2", _)))).toDF("g", "v")
    val got = graft.operators.Privacy.dpMedianByGroup(rows, "g", "v", Seq(1, 2), salt = "tm")
      .collect().map(r => (r.getString(0), r.getInt(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got.size == 4)
    val data = Map("g1" -> (1L to 9L), "g2" -> Seq(1L, 1L, 1L, 2L, 50L))
    for ((g, vs) <- data; j <- Seq(1, 2)) {
      val (n, truth, dp) = got((g, j))
      assert(n == vs.size)
      assert(truth == (if (g == "g1") 5L else 1L)) // lower medians
      assert(dp == modelDpMedian(vs.toSeq, s"tm$j|$g", j), s"($g,$j)")
    }
  }

  test("q_dp_median: real-table truth equals the engine's exact lower median") {
    val got = graft.queries.AnalyticsQueries.qDpMedian(spark, sfDir)
      .filter(col("eps_ln2") === 1).collect()
      .map(r => r.getString(0) -> (r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_returnflag").as("g"), round(col("l_quantity")).cast("long").as("v"))
    li.select("g").distinct().collect().map(_.getString(0)).foreach { g =>
      val vs = li.filter(col("g") === g).orderBy("v").collect().map(_.getLong(1))
      val lower = vs((vs.length - 1) / 2)
      val (n, truth, dp) = got(g)
      assert(n == vs.length && truth == lower, s"group $g")
      // the exponential mechanism at j=1 concentrates near the median:
      // the released value must sit inside the truncation window's grid span
      assert(dp >= vs.head && dp <= vs.last)
    }
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

  test("q_dp_topk: threshold release — only cleared tokens ship, clamp bounds contributions") {
    val rows = graft.queries.LlmQueries.qDpTopk(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, nTrue, noise, nNoisy) =>
      assert(nNoisy >= 20L, "released rows must clear the threshold")
      assert(nNoisy == math.max(0L, nTrue + noise))
    }
    // contribution bounding: no document can push any token's doc-count
    // past the corpus doc total, and the per-doc clamp means the sum of
    // all true counts is at most C × |docs|
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val perEps = rows.groupBy(_._2)
    perEps.foreach { case (_, rs) =>
      assert(rs.map(_._3).max <= nDocs)
      assert(rs.map(_._3).sum <= 10L * nDocs)
    }
    // suppression really bites: the full clamped vocabulary is strictly
    // larger than the released set at every epsilon
    val full = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).distinct().count()
    perEps.foreach { case (eps, rs) =>
      assert(rs.length < full, s"eps=$eps releases the whole vocabulary — no suppression")
    }
  }
}
