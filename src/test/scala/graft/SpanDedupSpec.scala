package graft

import graft.functions.{TextFunctions => TF}
import graft.operators.{Caches, Curation, Dedup}
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterEach

/** Span-level dedup ([[Dedup.removeRepeatedSpans]]) against a brute-force
  * reference on constructed corpora, plus the source-level quality gate.
  */
class SpanDedupSpec extends SparkSpec with BeforeAndAfterEach {
  import spark.implicits._

  override def afterEach(): Unit = Caches.release()

  /** Brute-force first-occurrence span dedup, mirroring the operator's
    * contract: spans are consecutive w-token windows of the \s+-split
    * lowercased text, global winner = lowest (id, span_idx).
    */
  private def reference(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] = {
    val spans = docs.flatMap { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val chunks = toks.grouped(w).map(_.mkString(" ")).toSeq
      chunks.zipWithIndex.map { case (c, i) => (id, i, c) }
    }
    val winner = spans.groupBy(_._3).map { case (c, occ) =>
      c -> occ.map(o => (o._1, o._2)).min
    }
    docs.map { case (id, text) =>
      val toks = text.trim.toLowerCase.split("\\s+", -1).toSeq
      val chunks = toks.grouped(w).map(_.mkString(" ")).toSeq.zipWithIndex
      val kept = chunks.filter { case (c, i) => winner(c) == (id, i) }
      id -> (chunks.size.toLong, kept.size.toLong, kept.map(_._1).mkString(" "))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], w: Int): Map[Long, (Long, Long, String)] =
    Dedup.removeRepeatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", spanWords = w)
      .collect()
      .map { case Row(id: Long, n: Long, k: Long, t: String) => id -> (n, k, t) }
      .toMap

  test("constructed corpus: repeated spans keep exactly the first occurrence") {
    // doc 1 and doc 3 share their first 4-token span; doc 2 repeats doc 1's
    // second span; doc 4 is fully distinct.
    val docs = Seq(
      1L -> "a b c d e f g h",
      2L -> "e f g h x y z w",
      3L -> "a b c d q r s t",
      4L -> "m n o p"
    )
    val got = run(docs, 4)
    assert(got === reference(docs, 4))
    // the shared spans survived exactly once, in the lowest-(id, idx) doc
    assert(got(1L) === ((2L, 2L, "a b c d e f g h")))
    assert(got(2L)._3 === "x y z w")
    assert(got(3L)._3 === "q r s t")
    assert(got(4L)._3 === "m n o p")
  }

  test("a document whose every span occurred earlier reassembles to empty text") {
    val docs = Seq(
      1L -> "a b c d e f",
      2L -> "a b c d e f" // same two 3-token spans, later id
    )
    val got = run(docs, 3)
    assert(got(1L) === ((2L, 2L, "a b c d e f")))
    assert(got(2L) === ((2L, 0L, "")))
  }

  test("within-document repetition dedups too (boilerplate inside one doc)") {
    val docs = Seq(5L -> "x y x y x y")
    val got = run(docs, 2)
    assert(got(5L) === ((3L, 1L, "x y")))
  }

  test("trailing short span and single-span docs round-trip unchanged") {
    val docs = Seq(1L -> "a b c d e", 2L -> "zz")
    val got = run(docs, 4)
    assert(got === reference(docs, 4))
    assert(got(1L) === ((2L, 2L, "a b c d e")))
    assert(got(2L) === ((1L, 1L, "zz")))
  }

  test("randomized corpus with duplication matches brute force") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("red", "blue", "green", "ox", "owl", "fir", "elm", "ash")
    val base = (0 until 60).map { i =>
      i.toLong -> Seq.fill(3 + rnd.nextInt(20))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    // duplicate some docs verbatim under higher ids: every span collides
    val dups = (0 until 15).map(i => (100L + i) -> base(rnd.nextInt(base.size))._2)
    val docs = base ++ dups
    assert(run(docs, 5) === reference(docs, 5))
  }

  test("boilerplate skew: one span duplicated across 50k docs stays bounded") {
    // every doc = the same boilerplate span + a unique tail span; the
    // winner election must partial-combine the 50k-way duplicate map-side
    // (one min per task), and only doc 0 keeps the boilerplate.
    val n = 50000
    val docs = spark.range(n).selectExpr(
      "id AS doc_id",
      "concat('legal disclaimer boilerplate line ', ' unique tail token ', cast(id AS string)) AS text")
    val out = Dedup.removeRepeatedSpans(docs, "doc_id", "text", spanWords = 5)
      .agg(sum("n_spans").as("spans"), sum("n_kept").as("kept"))
      .collect().head
    // 2 spans per doc (9 tokens, w=5); the shared first span survives once
    assert(out.getLong(0) === 2L * n)
    assert(out.getLong(1) === n + 1L)
  }

  test("output row count always equals input docs (empty docs included)") {
    val docs = Seq(1L -> "", 2L -> "a b", 3L -> "")
    val got = run(docs, 3)
    assert(got.size === 3)
    // both empty docs produce the same single empty span; only the first keeps it
    assert(got(1L) === ((1L, 1L, "")))
    assert(got(3L) === ((1L, 0L, "")))
  }

  test("span winner election never materializes per-span id arrays (plan contract)") {
    val df = Dedup.removeRepeatedSpans(
      Seq(1L -> "a b c d").toDF("doc_id", "text"), "doc_id", "text", spanWords = 2)
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("collect_set"))
    // the only collect_list is the per-document reassembly (bounded by the
    // document's own span count), keyed by doc_id — not by span hash
    val aggLines = plan.linesIterator.filter(_.contains("collect_list")).toSeq
    assert(aggLines.forall(_.contains("doc_id")), aggLines.mkString("\n"))
  }

  test("graft_token_spans equals the declarative transform/slice construction") {
    import graft.plans.NativeHash
    val rnd = new scala.util.Random(11)
    val alphabet = "ab \t\n  x"
    val edge = Seq("", " ", "  ", "a", "  a  b ", "a\tb  c", "\ta b", "x y z w v u t", "a  b\nc")
    val fuzz = Seq.fill(200)(Seq.fill(rnd.nextInt(30))(alphabet(rnd.nextInt(alphabet.length))).mkString)
    for (w <- Seq(1, 3, 10)) {
      val toks = TF.tokens(col("text"))
      val n = ceil(size(toks).cast("double") / lit(w.toDouble)).cast("int")
      val declarative = transform(sequence(lit(0), n - lit(1)), i =>
        array_join(slice(toks, i * lit(w) + lit(1), lit(w)), " "))
      val rows = (edge ++ fuzz).toDF("text")
        .select(col("text"), NativeHash.tokenSpans(col("text"), w).as("native"), declarative.as("decl"))
        .collect()
      rows.foreach { r =>
        assert(r.getSeq[String](1) === r.getSeq[String](2),
          s"w=$w text=${r.getString(0).replace("\t", "\\t").replace("\n", "\\n")}")
      }
    }
  }

  test("source gate keeps exactly the sources at/above the corpus mean") {
    val docs = Seq(
      // srcA: long wordy texts (higher quality), srcB: terse punctuation
      (1L, "srcA", "the fox and the owl went to the market in the morning and it is fine"),
      (2L, "srcA", "it is a tale of the river and of the hills and the wind"),
      (3L, "srcB", "x,y.z!"),
      (4L, "srcB", "q;w:e.")
    ).toDF("doc_id", "source", "text")
    val out = Curation.sourceQualityGate(docs, "doc_id", "source", TF.qualityScore(col("text")))
      .orderBy("doc_id").collect()
    assert(out.map(_.getLong(0)).toSeq === Seq(1L, 2L))
    assert(out.forall(_.getString(1) == "srcA"))
    // src_avg column equals the mean of srcA's two quality scores
    val qs = docs.filter($"source" === "srcA")
      .select(TF.qualityScore(col("text"))).as[Double].collect()
    assert(math.abs(out.head.getDouble(3) - qs.sum / qs.size) < 1e-12)
  }

  test("source gate document rows never shuffle (broadcast-gate plan contract)") {
    val docs = Seq((1L, "s", "a b c")).toDF("doc_id", "source", "text")
    val plan = Curation.sourceQualityGate(docs, "doc_id", "source", TF.qualityScore(col("text")))
      .queryExecution.executedPlan.toString
    // the gate join must be broadcast — no SortMergeJoin / ShuffledHashJoin
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"), plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
