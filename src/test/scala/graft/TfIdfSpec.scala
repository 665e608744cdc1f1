package graft

import graft.operators.TfIdf
import org.apache.spark.sql.functions._

/** TF-IDF top-k: hand-computed scores on a tiny corpus, deterministic
  * tie-break, and the per-doc top-k window rewriting to the bounded
  * graft_topk aggregate.
  */
class TfIdfSpec extends SparkSpec {
  import spark.implicits._

  test("hand-computed tf·N/df on a 3-doc corpus, ties broken by term") {
    // N=3; df: a=2, b=1, c=2, d=1
    val docs = Seq((1L, "a a b"), (2L, "a c"), (3L, "c d")).toDF("doc_id", "text")
    val got = TfIdf.topKTerms(docs, "doc_id", "text", 2)
      .orderBy("doc_id", "term_rank")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getDouble(4), r.getInt(5))).toSeq
    assert(got == Seq(
      (1L, "a", 2L, 2L, 3.0, 1), // tie with b at 3.0 -> term order
      (1L, "b", 1L, 1L, 3.0, 2),
      (2L, "a", 1L, 2L, 1.5, 1),
      (2L, "c", 1L, 2L, 1.5, 2),
      (3L, "d", 1L, 1L, 3.0, 1),
      (3L, "c", 1L, 2L, 1.5, 2)))
  }

  test("k bounds output per doc and the window is bounded before the shuffle") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val out = TfIdf.topKTerms(docs, "doc_id", "text", 3)
    val perDoc = out.groupBy("doc_id").count().agg(max("count")).first().getLong(0)
    assert(perDoc <= 3L)
    // the per-doc top-k must not shuffle whole groups: either graft's heap
    // aggregate or Spark's WindowGroupLimit (map-side Partial bound) is fine
    val opt = out.queryExecution.optimizedPlan.toString
    assert(opt.contains("graft_topk") || opt.contains("WindowGroupLimit"),
      s"no bounded top-k in the plan:\n$opt")
  }
}
