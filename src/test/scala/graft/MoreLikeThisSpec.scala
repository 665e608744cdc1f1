package graft

/** More-like-this (`TfIdf.moreLikeThis`): BigInt driver model over the
  * real corpus + the dfCap knob.
  */
class MoreLikeThisSpec extends SparkSpec {

  private def corpus(): Map[Long, Seq[String]] =
    spark.read.parquet(s"$sfDir/documents.parquet")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).trim.toLowerCase.split("\\s+").toSeq)
      .toMap

  test("ranking matches a BigInt driver model including the sim tree") {
    val docs = corpus()
    val n = docs.size.toLong
    val tf = docs.map { case (d, ts) =>
      d -> ts.groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    }
    val df = tf.values.flatMap(_.keys).groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
    val idf = df.map { case (t, d) => t -> (n * 1000000L) / d }
    // .toSeq everywhere a Set maps to numbers: Set semantics would collapse
    // two terms contributing the SAME product and silently drop one
    def norm(d: Long): BigInt =
      tf(d).toSeq.map { case (t, f) => BigInt(f * f) * idf(t) }.sum
    val queries = Seq(0L, 1L, 2L, 3L, 4L)
    val model = queries.flatMap { q =>
      val scores = docs.keys.toSeq.filter(_ != q).map { c =>
        val s = tf(q).keys.toSeq.filter(tf(c).contains)
          .map(t => BigInt(tf(q)(t) * tf(c)(t)) * idf(t)).sum
        (c, s)
      }.filter(_._2 > 0)
      scores.sortBy { case (c, s) => (-s, c) }.take(10).zipWithIndex.map {
        case ((c, s), i) =>
          val qn = norm(q); val cn = norm(c)
          val sim = s.toDouble / (math.sqrt(qn.toDouble) * math.sqrt(cn.toDouble))
          (q, c, s, qn, cn, sim, i + 1)
      }
    }.toSet
    val got = operators.TfIdf.moreLikeThis(
        spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", queries, 10)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), BigInt(r.getDecimal(2).toBigInteger),
        BigInt(r.getDecimal(3).toBigInteger), BigInt(r.getDecimal(4).toBigInteger),
        r.getDouble(5), r.getInt(6)))
      .toSet
    assert(got === model)
    assert(got.nonEmpty)
  }

  test("dfCap excludes ultra-common terms from the match") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    // every term in this corpus is common; a cap of 1 leaves no matchable
    // terms, so the result is empty — the knob verifiably gates the join
    val capped = operators.TfIdf.moreLikeThis(docs, "doc_id", "text",
      Seq(0L), k = 5, dfCap = 1L)
    assert(capped.count() === 0L)
  }
}
