package graft

import graft.queries.LlmQueries

/** Tokenizer-efficiency report (`qVocabCoverage`): internally consistent
  * with the per-doc token counts (`qBpeCount`) and the documents table —
  * same pinned merge chain, aggregated by source.
  */
class VocabCoverageSpec extends SparkSpec {

  test("per-source totals equal the per-doc BPE counts grouped by source; ratios are the pinned divisions") {
    val perDoc = LlmQueries.qBpeCount(spark, sfDir)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2)))).toMap
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "source", "text").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val model = docs.groupBy(_._2).map { case (src, g) =>
      val nw = g.map(d => perDoc(d._1)._1).sum
      val nb = g.map(d => perDoc(d._1)._2).sum
      val nc = g.map(_._3.length.toLong).sum
      src -> ((g.size.toLong, nw, nb, nc, nc.toDouble / nb, nb.toDouble / nw))
    }
    val got = LlmQueries.qVocabCoverage(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5), r.getDouble(6)))).toMap
    assert(got === model)
    assert(got.nonEmpty && got.values.forall { case (_, nw, nb, _, cpt, fert) =>
      nb >= nw && cpt > 0 && fert >= 1.0 // merges only ever shrink below chars, never below words
    })
  }
}
