package graft

import graft.operators.Dedup

/** Quality × duplication calibration ([[Dedup.nearDupMembership]],
  * `q_quality_dup_rate`): planted membership algebra and cross-operator
  * consistency with the cluster-size histogram.
  */
class QualityDupRateSpec extends SparkSpec {
  import spark.implicits._

  test("membership: identical twins, verified near-dups, and loners") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
      (2L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"), // identical set of 1
      (3L, "alpha beta gamma delta epsilon zeta eta theta iota lambda"), // 9/11 = 0.82 vs 1
      (4L, "completely different words about unrelated topics entirely")
    ).toDF("doc_id", "text")
    val got = Dedup.nearDupMembership(docs, "doc_id", "text", 0.8)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(got === Map(1L -> true, 2L -> true, 3L -> true, 4L -> false))
  }

  test("q_quality_dup_rate: conservation and consistency with the cluster histogram") {
    val rows = graft.queries.LlmQueries.qQualityDupRate(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(rows.map(_._2).sum === total)
    rows.foreach { case (b, nd, du, rate) =>
      assert(b >= 0 && b <= 9 && du <= nd)
      assert(math.abs(rate - du.toDouble / nd) < 1e-15)
    }
    // members = corpus − singleton-cluster docs, per the histogram operator
    graft.operators.Caches.release()
    val singles = Dedup.clusterSizeHistogram(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 0.8)
      .filter(org.apache.spark.sql.functions.col("bucket") === 1)
      .collect().map(_.getLong(2)).headOption.getOrElse(0L)
    assert(rows.map(_._3).sum === total - singles)
  }
}
