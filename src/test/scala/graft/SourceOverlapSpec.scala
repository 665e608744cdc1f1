package graft

import graft.operators.Dedup

/** Cross-source duplication matrix
  * ([[graft.operators.Dedup.sourceOverlap]]): planted cross- and
  * intra-source twins with hand-checked counts and shares.
  */
class SourceOverlapSpec extends SparkSpec {
  import spark.implicits._

  test("planted twins land in the right matrix cells with the right shares") {
    // srcA: docs 1,2 identical (intra pair) + doc 3 unique
    // srcB: doc 11 identical to srcA's 1,2 (two cross pairs) + doc 12 unique
    // srcC: doc 21 unique — must not appear at all
    val df = Seq(
      (1L, "A", "alpha beta gamma delta"),
      (2L, "A", "alpha beta gamma delta"),
      (3L, "A", "totally different words here"),
      (11L, "B", "alpha beta gamma delta"),
      (12L, "B", "other unrelated content entirely"),
      (21L, "C", "lone document nothing shared")
    ).toDF("doc_id", "source", "text")
    val got = Dedup.sourceOverlap(df, "doc_id", "text", "source", threshold = 0.8)
      .orderBy("source_a", "source_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      ("A", "A", 1L, 2L, 2.0 / 3.0), // docs 1,2 of A's 3 docs
      ("A", "B", 2L, 3L, 3.0 / 5.0))) // (1,11),(2,11): docs 1,2,11 of 3+2
  }

  test("matrix is consistent with the raw verified pair set on the real table") {
    val pairs = Dedup.nearDupPairs(spark.read.parquet(s"$sfDir/documents.parquet"),
        "doc_id", "text", threshold = 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
    val src = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val model = pairs.map { case (a, b) =>
      val (sa, sb) = (src(a), src(b))
      ((if (sa <= sb) sa else sb, if (sa <= sb) sb else sa), (a, b))
    }.groupBy(_._1).map { case (k, g) =>
      k -> ((g.size.toLong, g.flatMap(p => Seq(p._2._1, p._2._2)).distinct.size.toLong))
    }
    val got = graft.queries.LlmQueries.qSourceOverlap(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getLong(3)))).toMap
    assert(got === model)
  }
}
