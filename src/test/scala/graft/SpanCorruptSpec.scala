package graft

import org.apache.spark.sql.functions._

/** T5 span-corruption example construction: coverage near the published
  * 15% rate, spans are MAXIMAL runs (never touching), sentinel ids dense
  * and ordered, span text reproduces the document's words, and the whole
  * example set is deterministic across runs.
  */
class SpanCorruptSpec extends SparkSpec {

  private lazy val rows = graft.queries.LlmQueries.qSpanCorrupt(spark, sfDir)
    .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))

  test("q_span_corrupt: coverage ~15%, spans maximal, sentinels dense-ordered") {
    val totalWords = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
      .filter(length(col("w")) > 0).count()
    val covered = rows.map(_._4.toLong).sum
    val rate = covered.toDouble / totalWords
    // 5% starts × mean length 3, shaved by overlap-merge and end-of-doc clip
    assert(rate > 0.10 && rate < 0.18, s"coverage rate $rate drifted from ~15%")

    rows.groupBy(_._1).foreach { case (doc, ss) =>
      val byId = ss.sortBy(_._2)
      // dense sentinel ids 0..n-1, ordered by span_start
      assert(byId.map(_._2).toSeq == byId.indices.toSeq, s"doc $doc sentinel ids not dense")
      assert(byId.map(_._3).toSeq == byId.map(_._3).sorted.toSeq, s"doc $doc sentinels out of order")
      // maximality: a span ending at p and another starting at p+1 would have merged
      byId.sliding(2).foreach {
        case Array((_, _, s1, l1, _), (_, _, s2, _, _)) =>
          assert(s2 > s1 + l1, s"doc $doc spans touch: start=$s1 len=$l1 next=$s2")
        case _ =>
      }
    }
  }

  test("q_span_corrupt: span text reproduces the document's words at those positions") {
    val docWords = spark.read.parquet(s"$sfDir/documents.parquet")
      .select(col("doc_id"), posexplode(graft.functions.TextFunctions.tokens(col("text")))
        .as(Seq("word_idx", "w")))
      .filter(length(col("w")) > 0)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getString(2))).toMap
    rows.foreach { case (doc, _, start, len, text) =>
      val words = text.split(" ", -1)
      assert(words.length == len, s"doc $doc span at $start: ${words.length} words != len $len")
      words.zipWithIndex.foreach { case (w, i) =>
        assert(docWords((doc, start + i)) == w,
          s"doc $doc pos ${start + i}: span word '$w' != doc word")
      }
    }
  }

  test("q_span_corrupt: deterministic across runs") {
    val again = graft.queries.LlmQueries.qSpanCorrupt(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(rows.toSeq == again.toSeq)
  }
}
