package graft

import graft.operators.Skew

/** Join-key skew audit ([[graft.operators.Skew.skewReport]]): planted
  * hot-key fixture, then the real lineitem report against a driver model.
  */
class SkewSpec extends SparkSpec {
  import spark.implicits._

  test("planted hot key lands in its own power-of-two bucket with the right share") {
    // 100 rows on key 0 (bucket 7: 64..127), 28 singleton keys (bucket 1)
    val df = (Seq.fill(100)(0L) ++ (1L to 28L)).toDF("k")
    val got = Skew.skewReport(df, "k").orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))).toSeq
    assert(got === Seq(
      (1, 28L, 28L, 1L, 28.0 / 128.0),
      (7, 1L, 100L, 100L, 100.0 / 128.0)))
  }

  test("lineitem report matches a driver model for every audited key") {
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey", "l_suppkey").collect()
    def model(get: org.apache.spark.sql.Row => Long) = {
      val cnts = rows.groupBy(get).map(_._2.length.toLong).toSeq
      val tot = cnts.sum
      cnts.groupBy(c => java.lang.Long.toBinaryString(c).length).map { case (b, cs) =>
        b -> ((cs.size.toLong, cs.sum, cs.max, cs.sum.toDouble / tot))
      }
    }
    val models = Map(
      "l_orderkey" -> model(_.getLong(0)),
      "l_partkey" -> model(_.getLong(1)),
      "l_suppkey" -> model(_.getLong(2)))
    val got = graft.queries.AnalyticsQueries.qSkewReport(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5)))).toMap
    val want = models.flatMap { case (k, m) => m.map { case (b, v) => (k, b) -> v } }
    assert(got === want)
  }
}
