package graft

import graft.operators.Curation

/** Quantile mapping ([[Curation.quantileMap]], `q_quantile_map`):
  * hand-computed rank alignment, monotonicity, and target-domain
  * closure on the real corpus.
  */
class QuantileMapSpec extends SparkSpec {
  import spark.implicits._

  test("uniform 4-point distributions align rank for rank") {
    val docs = (Seq((1L, "b", 1L), (2L, "b", 2L), (3L, "b", 3L), (4L, "b", 4L),
      (11L, "a", 10L), (12L, "a", 20L), (13L, "a", 30L), (14L, "a", 40L)))
      .toDF("doc_id", "source", "v")
    val got = Curation.quantileMap(docs, "doc_id", "source", "v", "b", "a")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSeq
    assert(got === Seq((1L, 1L, 10L), (2L, 2L, 20L), (3L, 3L, 30L), (4L, 4L, 40L)))
  }

  test("skewed source still maps into the target domain, monotonically") {
    // b: {1,1,1,9} -> pcts .75,.75,.75,1.0 ; a: {5,6,7,8} cdf .25/.5/.75/1.0
    val docs = (Seq((1L, "b", 1L), (2L, "b", 1L), (3L, "b", 1L), (4L, "b", 9L),
      (11L, "a", 5L), (12L, "a", 6L), (13L, "a", 7L), (14L, "a", 8L)))
      .toDF("doc_id", "source", "v")
    val got = Curation.quantileMap(docs, "doc_id", "source", "v", "b", "a")
      .orderBy("doc_id").collect()
      .map(r => (r.getLong(0), r.getLong(3))).toSeq
    assert(got === Seq((1L, 7L), (2L, 7L), (3L, 7L), (4L, 8L)))
  }

  test("q_quantile_map: closure in the target domain and rank preservation") {
    val rows = graft.queries.LlmQueries.qQuantileMap(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val targetVals = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(org.apache.spark.sql.functions.col("source") === "src0")
      .select("n_chars").collect().map(_.getLong(0)).toSet
    rows.foreach { case (_, _, pct, mapped) =>
      assert(targetVals.contains(mapped) && pct > 0.0 && pct <= 1.0)
    }
    // rank preservation: same order by value and by mapped value
    val byValue = rows.sortBy(r => (r._2, r._1)).map(_._4)
    assert(byValue === byValue.sorted)
  }
}
