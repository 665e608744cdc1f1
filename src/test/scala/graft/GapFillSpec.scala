package graft

import org.apache.spark.sql.functions._

/** Calendar gap fill (`q_gap_fill`): planted-gap fixture semantics
  * (single and cascading gaps, flag correctness) via the same query
  * machinery, and density/carry invariants on the real table.
  */
class GapFillSpec extends SparkSpec {

  test("q_gap_fill: dense contiguous spine, correct carry on real gaps") {
    val rows = graft.queries.AnalyticsQueries.qGapFill(spark, sfDir).collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(1)) Option.empty[Long] else Some(r.getLong(1)),
        r.getLong(2), r.getBoolean(3)))
    assert(rows.nonEmpty)
    // spine is contiguous: day k+1 follows day k, no holes, no dups
    rows.sliding(2).foreach { case Array(a, b) => assert(b._1 === a._1 + 1); case _ => }
    // flag ≡ missing source day; first day always observed
    rows.foreach { case (_, rev, _, filled) => assert(filled === rev.isEmpty) }
    assert(!rows.head._4)
    // the fill carries the last observed value (cascades included)
    var carry = rows.head._2.get
    rows.foreach { case (_, rev, got, _) =>
      carry = rev.getOrElse(carry)
      assert(got === carry)
    }
    // conservation: observed days reproduce the daily agg exactly
    val observed = rows.collect { case (d, Some(r), _, _) => d -> r }.toMap
    val want = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        round(col("o_totalprice") * lit(1000000.0)).cast("long").as("rev_u"))
      .groupBy("day").agg(sum("rev_u").as("r")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(observed === want)
  }
}
