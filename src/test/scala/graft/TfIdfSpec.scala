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

  test("rarity: exact duplicates score 0 novelty, unique docs score 1, slots in between") {
    val docs = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),   // dup of 2 -> all shingles shared
      (2L, "alpha beta gamma delta epsilon zeta"),
      (3L, "one two three four five six"),           // fully original
      (4L, "alpha beta gamma delta epsilon other")   // shares a prefix shingle with 1/2
    ).toDF("doc_id", "text")
    val got = TfIdf.rarityScore(docs, "doc_id", "text", dfMax = 1, shingleN = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // doc 1/2: shingles {a b g d e, b g d e z} both df=2 -> 0
    // doc 3: both shingles unique -> 1
    // doc 4: {a b g d e (df=3), b g d e other (df=1)} -> 0.5
    assert(got == Seq((1L, 2L, 0L, 0.0), (2L, 2L, 0L, 0.0),
      (3L, 2L, 2L, 1.0), (4L, 2L, 1L, 0.5)))
  }

  test("rarity: shingleN=1 counts distinct WORDS against corpus df") {
    val docs = Seq((1L, "x x y"), (2L, "y z")).toDF("doc_id", "text")
    // df: x=1, y=2, z=1; doc1 terms {x,y} -> 1 rare of 2; doc2 {y,z} -> 1 of 2
    val got = TfIdf.rarityScore(docs, "doc_id", "text", dfMax = 1)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 2L, 1L, 0.5), (2L, 2L, 1L, 0.5)))
  }

  test("rarity: docs shorter than the shingle width fall back to whole-text units") {
    val docs = Seq((1L, "tiny doc"), (2L, "tiny doc"), (3L, "other")).toDF("doc_id", "text")
    val got = TfIdf.rarityScore(docs, "doc_id", "text", dfMax = 1, shingleN = 5)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getDouble(3))).toSeq
    assert(got == Seq((1L, 0.0), (2L, 0.0), (3L, 1.0)))
  }
}
