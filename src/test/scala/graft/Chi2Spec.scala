package graft

/** χ² contingency audit ([[graft.queries.LlmQueries.chi2Cells]],
  * `q_chi2_independence`): exact-independence zero table, a planted
  * dependent table with a hand-computed statistic, and a driver model
  * on the real corpus.
  */
class Chi2Spec extends SparkSpec {
  import spark.implicits._

  test("perfectly independent table: every cell contribution is zero") {
    // 2x2 with obs == exp everywhere: rows (10,10) x cols (10,10), n=20
    val df = (Seq.fill(5)(("a", "x")) ++ Seq.fill(5)(("a", "y")) ++
      Seq.fill(5)(("b", "x")) ++ Seq.fill(5)(("b", "y"))).toDF("r", "c")
    val got = graft.queries.LlmQueries.chi2Cells(df, "r", "c").collect()
    assert(got.length === 4)
    got.foreach { g => assert(g.getLong(4) === 0L && g.getLong(3) === 5000000L) }
  }

  test("planted dependent table matches the hand-computed statistic") {
    // diagonal-heavy 2x2: [[8,2],[2,8]], margins (10,10)/(10,10), n=20
    // exp = 5 everywhere; chi2 = 4 * (3^2/5) = 7.2
    val df = (Seq.fill(8)(("a", "x")) ++ Seq.fill(2)(("a", "y")) ++
      Seq.fill(2)(("b", "x")) ++ Seq.fill(8)(("b", "y"))).toDF("r", "c")
    val got = graft.queries.LlmQueries.chi2Cells(df, "r", "c").collect()
    val total = got.map(_.getLong(4)).sum
    assert(total === 4L * 1800000000L) // 4 cells x 1.8 chi2-nano each
  }

  test("q_chi2_independence matches a driver model") {
    val rows = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("lang", "source").collect().map(r => (r.getString(0), r.getString(1)))
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowN = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colN = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toDouble
    val want = cells.toSeq.sortBy(_._1).map { case ((l, s), obs) =>
      val exp = rowN(l).toDouble * colN(s).toDouble / n
      val dev = obs.toDouble - exp
      (l, s, obs, math.floor(exp * 1e6).toLong, math.floor(dev * dev / exp * 1e9).toLong)
    }
    val got = graft.queries.LlmQueries.qChi2Independence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4))).toSeq
    assert(got === want && got.nonEmpty)
  }
}
