package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Positional phrase search — the posting-list side of the retrieval
  * family ([[TfIdf.bm25]] ranks bags of words; this finds EXACT
  * multi-token phrases, the operator behind quoted-query search and
  * contamination checks for verbatim strings).
  */
object Search {

  /** All occurrences of `phrase` (whitespace tokens, lowercased — the
    * [[TextFunctions.tokens]] contract) as (doc_id, n_hits, first_pos).
    *
    * Mechanics: term i's postings shift left by i, so a phrase occurrence
    * is ONE (doc, start) value present in every term's shifted stream —
    * the classic positional-index adjacency intersection, expressed as
    * |phrase|−1 slim equi-joins.
    *
    * Scale shape: the `isin(terms)` filter runs in the SCAN stage, so
    * only the phrase's own postings ever leave a task — for a 3-term
    * phrase over a 10¹²-token corpus that is three term-frequency-sized
    * slim (doc, pos) streams, not the corpus. The joins key on
    * (doc_id, start): co-partitioned after the first shuffle, and each
    * stage can only shrink the stream. Repeated phrase terms cost one
    * extra pass over the same filtered postings, nothing more.
    */
  def phraseSearch(docs: DataFrame, idCol: String, textCol: String,
                   phrase: String): DataFrame = {
    val terms = phrase.toLowerCase.trim.split("\\s+").toSeq
    require(terms.nonEmpty && terms.head.nonEmpty, "empty phrase")
    val toks = docs.select(col(idCol).as("doc_id"),
        posexplode(TextFunctions.tokens(col(textCol))).as(Seq("pos", "term")))
      .filter(col("term").isin(terms.distinct: _*))
    val streams = terms.zipWithIndex.map { case (t, i) =>
      toks.filter(col("term") === t).select(col("doc_id"), (col("pos") - i).as("start"))
    }
    streams.reduce((a, b) => a.join(b, Seq("doc_id", "start")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_hits"), min("start").as("first_pos"))
  }
}
