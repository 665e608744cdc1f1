package graft

import graft.operators.Curation

/** Pairwise total-variation distance
  * ([[graft.operators.Curation.distributionDistance]]): identity fixtures
  * (TV=0 same distribution, TV=1 disjoint vocab), a hand-computed middle
  * case, and the real table against a driver model.
  */
class DivergenceSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(String, String)]) =
    Curation.distributionDistance(rows.toDF("g", "text"), "g", "text")
      .orderBy("group_a", "group_b").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq

  test("identical distributions give TV=0; disjoint vocabularies give TV=1") {
    val got = run(Seq(
      ("a", "x x y"), ("b", "x x y"),   // identical
      ("c", "p q r")))                   // disjoint from both
    assert(got === Seq(
      ("a", "b", 9L, 9L, 0.0),
      ("a", "c", 0L, 9L, 1.0),
      ("b", "c", 0L, 9L, 1.0)))
  }

  test("hand-computed overlap: p=(2/3,1/3) q=(1/3,2/3) has TV=1/3") {
    // min(2*3, 1*3) + min(1*3, 2*3) = 3 + 3 = 6 over denom 9 → tv = 1/3
    val got = run(Seq(("a", "x x y"), ("b", "x y y")))
    assert(got === Seq(("a", "b", 6L, 9L, 1.0 - 6.0 / 9.0)))
  }

  test("real documents: matrix matches a driver model and TV is within [0,1]") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "text").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val counts = docs.flatMap { case (g, t) =>
      t.trim.toLowerCase.split("\\s+").map(w => (g, w))
    }.groupBy(identity).map { case ((g, w), v) => (g, w, v.length.toLong) }.toSeq
    val m = counts.groupBy(_._1).map { case (g, v) => g -> v.map(_._3).sum }
    val byG = counts.groupBy(_._1).map { case (g, v) => g -> v.map(c => c._2 -> c._3).toMap }
    val gs = m.keys.toSeq.sorted
    val model = (for { a <- gs; b <- gs if a < b } yield {
      val (ca, cb) = (byG(a), byG(b))
      val num = ca.keysIterator.filter(cb.contains)
        .map(w => math.min(ca(w) * m(b), cb(w) * m(a))).sum
      val denom = m(a) * m(b)
      (a, b, num, denom, 1.0 - num.toDouble / denom)
    }).sortBy(t => (t._1, t._2))
    val got = graft.queries.LlmQueries.qSourceDivergence(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === model)
    assert(got.forall(t => t._5 >= 0.0 && t._5 <= 1.0))
  }
}
