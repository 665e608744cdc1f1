package graft

import org.apache.spark.sql.functions._

class JaccardPruneRuleSpec extends SparkSpec {
  import spark.implicits._

  private def pairs = {
    val words = Seq(
      (1L, Seq("a", "b", "c", "d")),
      (2L, Seq("a", "b", "c", "e")),
      (3L, Seq("a")), // size-ratio prunable vs 1/2
      (4L, Seq("x", "y", "z", "w"))
    ).toDF("id", "words")
    words.as("l").join(words.as("r"), col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"),
        col("l.words").as("wa"), col("r.words").as("wb"))
  }

  private def jaccardFilter = pairs.filter(
    size(array_intersect(col("wa"), col("wb"))).cast("double") /
      size(array_union(col("wa"), col("wb"))).cast("double") >= 0.5)

  test("rule injects the size-ratio prune ahead of the jaccard divide") {
    val optimized = jaccardFilter.queryExecution.optimizedPlan.toString
    assert(optimized.contains("least") && optimized.contains("greatest"),
      s"expected injected prune in:\n$optimized")
  }

  test("results are unchanged by the rewrite") {
    val got = jaccardFilter.select("id_a", "id_b").collect().toSet
    assert(got.map(r => (r.getLong(0), r.getLong(1))) == Set((1L, 2L)))
  }
}
