package graft

/** Fixed-domain pivot (`qPivot`): missing cells must surface as 0, and the
  * real-orders matrix must match a driver model.
  */
class PivotSpec extends SparkSpec {
  import spark.implicits._

  test("a priority with no orders in a status gets a 0 cell, not a null/missing column") {
    val df = Seq(("1-URGENT", "F"), ("1-URGENT", "F"), ("2-HIGH", "O"))
      .toDF("o_orderpriority", "o_orderstatus")
    val got = df.groupBy($"o_orderpriority").pivot("o_orderstatus", Seq("F", "O", "P"))
      .count().na.fill(0L, Seq("F", "O", "P"))
      .orderBy("o_orderpriority").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === Seq(("1-URGENT", 2L, 0L, 0L), ("2-HIGH", 0L, 1L, 0L)))
  }

  test("real orders matrix matches a driver model") {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderpriority", "o_orderstatus").collect()
      .map(r => (r.getString(0), r.getString(1)))
    val model = rows.groupBy(_._1).map { case (p, g) =>
      (p, g.count(_._2 == "F").toLong, g.count(_._2 == "O").toLong,
        g.count(_._2 == "P").toLong)
    }.toSeq.sortBy(_._1)
    val got = graft.queries.AnalyticsQueries.qPivot(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === model)
  }
}
