package graft

/** Markov transition matrix (`qMarkovTransitions`) and rolling revenue
  * (`qRollingRevenue`): hand fixtures + real-table driver models.
  */
class TransitionsSpec extends SparkSpec {

  test("transition matrix matches a driver model on the real events table") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("event_id", "ts", "user_id", "event_type").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getLong(2), r.getString(3)))
    val trans = ev.groupBy(_._3).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(e => (e._2, e._1)).map(_._4)
      ordered.zip(ordered.drop(1))
    }
    val counts = trans.groupBy(identity).map { case (k, v) => k -> v.size.toLong }
    val rowN = counts.groupBy(_._1._1).map { case (p, m) => p -> m.values.sum }
    val model = counts.map { case ((p, n), c) => (p, n) -> ((c, c.toDouble / rowN(p))) }
    val got = graft.queries.AnalyticsQueries.qMarkovTransitions(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1)) -> ((r.getLong(2), r.getDouble(3)))).toMap
    assert(got === model)
    // rows are proper conditional distributions
    got.keys.map(_._1).toSeq.distinct.foreach { p =>
      assert(math.abs(got.filter(_._1._1 == p).values.map(_._2).sum - 1.0) < 1e-9)
    }
  }

  test("rolling revenue matches a driver model; calendar gaps shrink the frame") {
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](0)
        val us = t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L + t.getNano / 1000L
        (us / 86400000000L, math.round(r.getDouble(1) * 1e6))
      }
    val daily = orders.groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }.toSeq.sortBy(_._1)
    val model = daily.map { case (d, rev) =>
      val win = daily.filter { case (d2, _) => d2 >= d - 6 && d2 <= d }
      d -> ((rev, win.size.toLong, win.map(_._2).sum,
        win.map(_._2).sum.toDouble / win.size))
    }.toMap
    val got = graft.queries.AnalyticsQueries.qRollingRevenue(spark, sfDir).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))).toMap
    assert(got === model)
  }
}
