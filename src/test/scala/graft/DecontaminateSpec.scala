package graft

import graft.operators.Decontaminate
import org.apache.spark.sql.functions._

/** Cross-corpus n-gram containment decontamination on constructed
  * contamination: verbatim leaks, partial quotes, clean docs, short docs.
  */
class DecontaminateSpec extends SparkSpec {
  import spark.implicits._

  private val benchText = "the quick brown fox jumps over the lazy dog tonight"

  private def benchmark = Seq((100L, benchText)).toDF("id", "text")

  private def corpus = Seq(
    (1L, benchText),                                           // verbatim leak → 1.0
    (2L, s"intro words here $benchText and a tail"),           // mostly contained
    (3L, "completely unrelated content about spark plans and shuffles today"),
    (4L, "quick brown fox appears briefly in otherwise novel running text about engines"),
    (5L, "tiny doc")                                           // < n words: single whole-text shingle
  ).toDF("id", "text")

  test("overlap ratios: verbatim = 1.0, clean = 0.0, partial in between") {
    val stats = Decontaminate.overlap(corpus, benchmark, "id", "text", n = 3)
      .orderBy("id").collect()
      .map(r => r.getLong(0) -> r.getDouble(3)).toMap
    assert(stats(1L) == 1.0)
    assert(stats(2L) > 0.5 && stats(2L) < 1.0, s"partial quote: ${stats(2L)}")
    assert(stats(3L) == 0.0)
    assert(stats(4L) > 0.0 && stats(4L) < 0.2, s"brief mention: ${stats(4L)}")
    assert(stats(5L) == 0.0, "whole-text shingle of a short doc must not match")
  }

  test("dropContaminated keeps exactly the low-overlap docs, bodies intact") {
    val kept = Decontaminate.dropContaminated(corpus, benchmark, "id", "text",
        n = 3, maxOverlap = 0.5)
      .orderBy("id").collect()
    assert(kept.map(_.getLong(0)).toSeq == Seq(3L, 4L, 5L))
    assert(kept.forall(_.getString(1).nonEmpty))
  }

  test("native shingle set == declarative array_distinct(wordShingles) on random text") {
    val rnd = new scala.util.Random(13)
    val vocab = Seq("a", "bb", "ccc", "Dd", "e!", "ff", "g", "hh", "", "  ")
    val texts = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ ((99L, ""))
    val df = texts.toDF("id", "text")
    for (n <- Seq(1, 2, 3, 5)) {
      val native = df.select(col("id"),
        explode(graft.plans.NativeHash.shingleSet(col("text"), n)).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val declarative = df.select(col("id"),
        explode(array_distinct(graft.functions.TextFunctions.wordShingles(col("text"), n))).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(native == declarative, s"n=$n diverged")
    }
  }

  test("native sep shingle set == declarative transform(wordShingles, translate) on random text") {
    // the Dedup.setUnits form: shingle tokens joined on the U+0001
    // sentinel so each shingle stays one non-whitespace token
    val rnd = new scala.util.Random(17)
    val vocab = Seq("a", "bb", "ccc", "Dd", "e!", "ff", "g", "hh", "", "  ")
    val texts = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(12)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ ((99L, ""))
    val df = texts.toDF("id", "text")
    for (n <- Seq(2, 4)) {
      val native = df.select(col("id"),
        explode(graft.plans.NativeHash.shingleSetSep(col("text"), n, "\u0001")).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val declarative = df.select(col("id"),
        explode(array_distinct(transform(
          graft.functions.TextFunctions.wordShingles(col("text"), n),
          s => translate(s, " ", "\u0001")))).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(native == declarative, s"n=$n diverged")
    }
  }

  test("native shingle list == filter(size>=n) + explode(wordShingles) with duplicates kept") {
    val rnd = new scala.util.Random(19)
    val vocab = Seq("x", "x", "yy", "zzz", "x yy", "w!")
    val texts = (1 to 60).map { i =>
      (i.toLong, (0 until rnd.nextInt(9)).map(_ => vocab(rnd.nextInt(vocab.length))).mkString(" "))
    } :+ ((99L, "")) :+ ((100L, "one two"))
    val df = texts.toDF("id", "text")
    for (n <- Seq(1, 2, 3)) {
      val native = df.select(col("id"),
        explode(graft.plans.NativeHash.shingleList(col("text"), n)).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      val declarative = df
        .filter(size(graft.functions.TextFunctions.tokens(col("text"))) >= n)
        .select(col("id"),
          explode(graft.functions.TextFunctions.wordShingles(col("text"), n)).as("g"))
        .collect().map(r => (r.getLong(0), r.getString(1))).sorted.toSeq
      assert(native == declarative, s"n=$n diverged")
    }
  }

  test("benchmark shingle set broadcasts (plan contract)") {
    val plan = Decontaminate.overlap(corpus, benchmark, "id", "text", n = 3)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastExchange"), plan)
  }
}
