package graft

import graft.operators.ClusterReport

/** Cluster-quality report ([[graft.operators.ClusterReport.report]]):
  * hand-computable 2-d fixture, then the real labeled embeddings table
  * against a driver model.
  */
class ClusterReportSpec extends SparkSpec {
  import spark.implicits._

  test("2-d fixture: floor-mean centroids and exact intra/nearest distances") {
    val df = Seq(
      (0, Seq(0f, 0f)), (0, Seq(1f, 0f)),
      (1, Seq(10f, 0f)), (1, Seq(10f, 1f)),
      (2, Seq(0f, 10f)), (2, Seq(1f, 10f))
    ).toDF("label", "embedding")
    val got = ClusterReport.report(df, "label", "embedding")
      .orderBy("label").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getLong(5))).toSeq
    val u = 1000000L // micro-units
    // centroids: 0 → (u/2, 0); 1 → (10u, u/2); 2 → (u/2, 10u)
    val intra = 2 * (u / 2) * (u / 2) // each pair's members sit u/2 off-centroid
    val d01 = (10 * u - u / 2) * (10 * u - u / 2) + (u / 2) * (u / 2) // 0↔1 (and by symmetry 1's nearest)
    val d02 = (10 * u) * (10 * u) // 0↔2: same x, 10u apart in y
    assert(d01 < d02) // so label 0's nearest is 1, label 2's is 0
    assert(got === Seq(
      (0, 2L, intra, intra / 2.0, 1, d01),
      (1, 2L, intra, intra / 2.0, 0, d01),
      (2, 2L, intra, intra / 2.0, 0, d02)))
  }

  test("real embeddings: report matches a driver model") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1).map(x => math.round(x.toDouble * 1e6)).toArray))
    val dim = rows.head._2.length
    def floorDiv(s: Long, c: Long) = (s - ((s % c + c) % c)) / c
    val cents = rows.groupBy(_._1).map { case (l, g) =>
      l -> (0 until dim).map(j => floorDiv(g.map(_._2(j)).sum, g.size)).toArray
    }
    val labels = cents.keys.toSeq.sorted
    val model = labels.map { l =>
      val g = rows.filter(_._1 == l)
      val c = cents(l)
      val sumD2 = g.map(v => (0 until dim).map { j => val d = v._2(j) - c(j); d * d }.sum).sum
      val (nl, nd) = labels.filter(_ != l).map { m =>
        (m, (0 until dim).map { j => val d = cents(m)(j) - c(j); d * d }.sum)
      }.minBy { case (m, d) => (d, m) }
      (l, g.length.toLong, sumD2, sumD2.toDouble / g.length, nl, nd)
    }
    val got = graft.queries.LlmQueries.qClusterReport(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3), r.getInt(4), r.getLong(5))).toSeq
    assert(got === model)
  }
}
