package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Vocabulary concentration (Simpson/Gini) and growth (Heaps table):
  * closed-form fixtures plus the saturation semantics the curation signal
  * exists for.
  */
class VocabStatsSpec extends SparkSpec {
  import spark.implicits._

  test("concentration: uniform vs single-type distributions hit the closed forms") {
    val docs = Seq(
      ("mono", "a a a a"),             // one type: simpson = 1
      ("uni", "a b c d"),              // 4 types × 1: simpson = 4/16
      ("skew", "a a a b")              // 9+1 over 16
    ).toDF("src", "text")
    val got = Curation.vocabConcentration(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    assert(got("mono") === ((4L, 1L, 16L, 1.0)))
    assert(got("uni") === ((4L, 4L, 4L, 0.25)))
    assert(got("skew") === ((4L, 2L, 10L, 0.625)))
  }

  test("concentration flags the boilerplate source against diverse prose") {
    val docs = ((0 until 30).map(i => ("boiler", "all rights reserved")) ++
      (0 until 30).map(i => ("prose", s"word$i token$i item$i"))).toDF("src", "text")
    val got = Curation.vocabConcentration(docs, "src", "text")
      .collect().map(r => r.getString(0) -> r.getDouble(4)).toMap
    assert(got("boiler") > 0.3 && got("prose") < 0.05)
  }

  test("growth: counts are prefix-exact and the saturated corpus plateaus") {
    // docs 0..9 introduce new vocab; 10..99 reuse it
    val docs = (0L until 100L).map { i =>
      if (i < 10) (i, s"w$i x$i") else (i, s"w${i % 10} x${i % 10}")
    }.toDF("doc_id", "text")
    val got = Curation.vocabGrowth(docs, "doc_id", "text", Seq(5L, 10L, 50L, 100L))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got(5L) === ((10L, 10L)))    // 5 docs × 2 tokens, all new
    assert(got(10L) === ((20L, 20L)))   // all 10 intro docs
    assert(got(50L) === ((100L, 20L)))  // tokens grow, vocab plateaus
    assert(got(100L) === ((200L, 20L)))
  }
}
