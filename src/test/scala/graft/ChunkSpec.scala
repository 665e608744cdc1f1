package graft

import graft.operators.Pack
import org.apache.spark.sql.functions._

/** Overlapping token-window chunking: start grid, overlap, short tails,
  * and the exact-partition degenerate case.
  */
class ChunkSpec extends SparkSpec {
  import spark.implicits._

  private val doc = (1L, (1 to 10).map(i => s"t$i").mkString(" ")) // 10 tokens

  test("stride < chunk gives the sliding overlap; last chunk runs short") {
    val got = Pack.chunkTokens(Seq(doc).toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 4, stride = 3)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))).toSeq
    assert(got == Seq(
      (0, 0, 4, "t1 t2 t3 t4"),
      (1, 3, 4, "t4 t5 t6 t7"),
      (2, 6, 4, "t7 t8 t9 t10"),
      (3, 9, 1, "t10")))
  }

  test("stride == chunk partitions the token stream exactly") {
    val got = Pack.chunkTokens(Seq(doc).toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 5, stride = 5)
      .orderBy("chunk_idx")
      .collect().map(r => (r.getInt(2), r.getString(4))).toSeq
    assert(got == Seq((0, "t1 t2 t3 t4 t5"), (5, "t6 t7 t8 t9 t10")))
    // reassembling the partition reproduces the tokenized document
    assert(got.map(_._2).mkString(" ") == doc._2)
  }

  test("documents shorter than one chunk emit exactly one short chunk") {
    val got = Pack.chunkTokens(Seq((1L, "a b")).toDF("doc_id", "text"), "doc_id", "text",
        chunkSize = 64, stride = 48)
      .collect().map(r => (r.getInt(1), r.getInt(3), r.getString(4))).toSeq
    assert(got == Seq((0, 2, "a b")))
  }

  test("no chunk is ever empty: zero-token inputs are filtered before the explode") {
    import org.apache.spark.sql.types._
    // bypass the string tokenizer's [""]-never-empty guarantee by probing
    // the operator's contract directly over a corpus with an empty doc
    val docs = Seq((1L, ""), (2L, "a b c")).toDF("doc_id", "text")
    val chunks = Pack.chunkTokens(docs, "doc_id", "text", chunkSize = 2, stride = 2)
    assert(chunks.filter(col("n_chunk_tokens") <= 0).count() == 0L)
  }

  test("every token is covered and consecutive chunks overlap by chunk - stride") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val chunks = Pack.chunkTokens(docs, "doc_id", "text", chunkSize = 64, stride = 48)
    val bad = chunks.groupBy("doc_id")
      .agg(max(col("chunk_start") + col("n_chunk_tokens")).as("covered_to"),
        max("chunk_start").as("last_start"), count(lit(1)).as("n"))
      .join(docs.select(col("doc_id"),
        graft.functions.TextFunctions.tokenCountWs(col("text")).as("n_tokens")), "doc_id")
      // full coverage, and the start grid stops within one stride of the end
      .filter(col("covered_to") =!= col("n_tokens") ||
        col("last_start") =!= (floor((col("n_tokens") - 1) / 48) * 48))
      .count()
    assert(bad == 0L)
    // chunking is shuffle-free: no Exchange in the plan
    assert(!chunks.queryExecution.executedPlan.toString.contains("Exchange"))
  }
}
