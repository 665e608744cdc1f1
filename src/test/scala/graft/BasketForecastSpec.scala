package graft

/** Market-basket pairs (`qBasketPairs`) and forecast baselines
  * (`qForecastBaseline`): driver models over the real tables.
  */
class BasketForecastSpec extends SparkSpec {

  test("basket pairs match a driver model including the pinned lift tree") {
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1))).distinct
    val nOrders = li.map(_._1).distinct.size.toLong
    val freq = li.groupBy(_._2).map { case (p, xs) => p -> xs.size.toLong }
    val co = li.groupBy(_._1).toSeq.flatMap { case (_, parts) =>
      val ps = parts.map(_._2).sorted
      for (i <- ps.indices; j <- (i + 1) until ps.size) yield (ps(i), ps(j))
    }.groupBy(identity).map { case (k, xs) => k -> xs.size.toLong }
    val model = co.toSeq.map { case ((a, b), n) =>
      (a, b, n, freq(a), freq(b), n.toDouble / freq(a) * nOrders / freq(b))
    }.sortBy { case (a, b, n, _, _, _) => (-n, a, b) }.take(50)
    val got = queries.AnalyticsQueries.qBasketPairs(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getDouble(5))).toSeq
    assert(got === model)
    assert(got.size === 50)
  }

  test("forecast baselines match a driver model and respect calendar gaps") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](0)
        val us = t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          t.getNano / 1000L
        (us / 86400000000L, math.round(r.getDouble(1) * 1e6))
      }
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }
    def backtest(shift: Int): (Long, Long, Double) = {
      val errs = daily.toSeq.flatMap { case (d, y) =>
        daily.get(d - shift).map(yh => math.abs(y - yh))
      }
      (errs.size.toLong, errs.sum, errs.sum.toDouble / errs.size)
    }
    val (nn, sn, mn) = backtest(1); val (ns, ss, ms) = backtest(7)
    val r = queries.AnalyticsQueries.qForecastBaseline(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getDouble(2)) === ((nn, sn, mn)))
    assert((r.getLong(3), r.getLong(4), r.getDouble(5)) === ((ns, ss, ms)))
    assert(nn > 0 && ns > 0)
  }
}
