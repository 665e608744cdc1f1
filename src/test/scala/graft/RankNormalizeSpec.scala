package graft

import graft.operators.Curation

/** ECDF rank normalization ([[graft.operators.Curation.rankNormalize]]):
  * hand fixture with ties and multiple groups, then the real table vs a
  * driver model.
  */
class RankNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("ties share the <=-rank; each group normalizes on its own scale") {
    val df = Seq(
      (1L, "a", 10L), (2L, "a", 10L), (3L, "a", 20L), (4L, "a", 30L),
      (5L, "b", 100L), (6L, "b", 200L)
    ).toDF("id", "g", "v")
    val got = Curation.rankNormalize(df, "id", "g", "v")
      .orderBy("id").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))).toSeq
    assert(got === Seq(
      (1L, "a", 10L, 2L, 4L, 0.5), (2L, "a", 10L, 2L, 4L, 0.5),
      (3L, "a", 20L, 3L, 4L, 0.75), (4L, "a", 30L, 4L, 4L, 1.0),
      (5L, "b", 100L, 1L, 2L, 0.5), (6L, "b", 200L, 2L, 2L, 1.0)))
  }

  test("real documents: per-doc ECDF matches a driver model; max per source is 1.0") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "n_chars").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val bySrc = docs.groupBy(_._2)
    val model = docs.map { case (id, src, v) =>
      val vs = bySrc(src).map(_._3)
      val le = vs.count(_ <= v).toLong
      id -> ((src, v, le, vs.length.toLong, le.toDouble / vs.length))
    }.toMap
    val got = graft.queries.LlmQueries.qScoreNormalize(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    assert(got === model)
    assert(got.values.groupBy(_._1).values.forall(_.map(_._5).max == 1.0))
  }
}
