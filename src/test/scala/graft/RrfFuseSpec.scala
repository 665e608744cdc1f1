package graft

import graft.operators.{Ann, Quant}
import graft.queries.LlmQueries
import org.apache.spark.sql.functions._

/** Reciprocal rank fusion (`qRrfFuse`): the fused ranking equals a
  * driver-side RRF of the two branch rankings, including the
  * single-branch coalesce path and bit-exact scores.
  */
class RrfFuseSpec extends SparkSpec {

  test("fused top-10 equals the driver-side RRF of the two branch top-20s") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val qs = emb.filter(col("vec_id") < 5)
    def ranks(df: org.apache.spark.sql.DataFrame): Map[(Long, Long), Int] =
      df.select("query_id", "neighbor_id", "rank").collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getInt(2)).toMap
    val cos = ranks(Ann.bruteForceTopK(qs, emb, "vec_id", "embedding", k = 20))
    val ham = ranks(Quant.annTopKHamming(qs, emb, "vec_id", "embedding", k = 20))
    // the two branches must actually disagree somewhere, and some pair must
    // appear in only one branch — otherwise this spec tests nothing
    val union = (cos.keySet ++ ham.keySet).toSeq
    assert(union.exists(p => cos.contains(p) ^ ham.contains(p)), "branches identical — fixture degenerate")
    val score = union.map { p =>
      p -> ((cos.get(p).map(r => 1.0 / (60 + r)).getOrElse(0.0)) +
            (ham.get(p).map(r => 1.0 / (60 + r)).getOrElse(0.0)))
    }.toMap
    val expected = union.groupBy(_._1).flatMap { case (q, ps) =>
      ps.map(_._2).sortBy(n => (-score((q, n)), n)).take(10).zipWithIndex
        .map { case (n, i) => (q, n) -> ((i + 1, score((q, n)))) }
    }
    val got = LlmQueries.qRrfFuse(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> ((r.getInt(3), r.getDouble(2)))).toMap
    assert(got === expected)
  }
}
