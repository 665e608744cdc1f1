package graft

import org.apache.spark.sql.functions._

/** Positional phrase search (`Search.phraseSearch`): planted fixture with
  * multi-hit, overlapping, and boundary cases + a real-table driver model.
  */
class PhraseSearchSpec extends SparkSpec {
  import spark.implicits._

  test("planted phrases: multi-hit, overlap, repeated terms, boundaries") {
    val docs = Seq(
      (1L, "a b c a b c"),        // "a b c" twice
      (2L, "a b a b a"),          // "a b a" overlapping at 0 and 2
      (3L, "x a b c"),            // hit not at position 0
      (4L, "a b"),                // phrase longer than doc tail
      (5L, "c b a"),              // right tokens, wrong order
      (6L, "A  B\tC")             // case + whitespace normalization
    ).toDF("doc_id", "text")
    val abc = operators.Search.phraseSearch(docs, "doc_id", "text", "a b c")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(abc === Set((1L, 2L, 0), (3L, 1L, 1), (6L, 1L, 0)))
    val aba = operators.Search.phraseSearch(docs, "doc_id", "text", "a b a")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(aba === Set((2L, 2L, 0))) // overlapping occurrences both count
  }

  test("real documents match a sliding-window driver model") {
    val phrase = Seq("batch", "agg", "row")
    val model = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .flatMap { r =>
        val toks = r.getString(1).trim.toLowerCase.split("\\s+")
        val starts = toks.indices.dropRight(phrase.size - 1)
          .filter(i => phrase.indices.forall(j => toks(i + j) == phrase(j)))
        if (starts.isEmpty) None
        else Some((r.getLong(0), starts.size.toLong, starts.min))
      }.toSet
    val got = queries.LlmQueries.qPhraseSearch(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got === model)
    assert(got.nonEmpty) // the registered phrase occurs in the corpus
  }
}
