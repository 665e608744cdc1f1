package graft

/** User growth (`qUserGrowth`), OLS trend fit (`qTrendFit`), and
  * time-to-convert percentiles (`qTimeToConvert`): driver models over the
  * real tables replaying each pinned contract exactly.
  */
class GrowthTrendSpec extends SparkSpec {

  private def eventsMs(): Array[(Long, Long, String, Double)] =
    spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getString(2), r.getDouble(3)))

  test("user growth matches a first-seen-day driver model") {
    val firstDay = eventsMs().groupBy(_._1).map { case (_, g) =>
      g.map(_._2 / 86400000L).min
    }.toSeq
    val perDay = firstDay.groupBy(identity).map { case (d, xs) => d -> xs.size.toLong }
      .toSeq.sortBy(_._1)
    var cum = 0L
    val model = perDay.map { case (d, n) => cum += n; (d, n, cum) }
    val got = queries.AnalyticsQueries.qUserGrowth(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === model)
    assert(got.last._3 === firstDay.size.toLong) // cumulative ends at |users|
  }

  test("trend fit matches a BigInt closed-form driver model on daily revenue") {
    val daily = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderdate", "o_totalprice").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](0)
        val us = t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          t.getNano / 1000L
        (us / 86400000000L, math.round(r.getDouble(1) * 1e6))
      }
      .groupBy(_._1).map { case (d, g) => d -> g.map(_._2).sum }.toSeq.sortBy(_._1)
    val d0 = daily.map(_._1).min
    val xs = daily.map { case (d, y) => (BigInt(d - d0), BigInt(y)) }
    val n = BigInt(xs.size)
    val sx = xs.map(_._1).sum; val sy = xs.map(_._2).sum
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val num = (n * sxy - sx * sy).toDouble
    val den = (n * sxx - sx * sx).toDouble
    val deny = (n * syy - sy * sy).toDouble
    val slope = num / den
    val r = queries.AnalyticsQueries.qTrendFit(spark, sfDir).collect().head
    assert(r.getLong(0) === xs.size.toLong)
    assert(r.getDouble(1) === slope)
    assert(r.getDouble(2) === (sy.toDouble - slope * sx.toDouble) / n.toDouble)
    assert(r.getDouble(3) === (num * num) / (den * deny))
    assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0 + 1e-12)
  }

  test("time-to-convert matches a histogram-CDF driver model") {
    val perUser = eventsMs().groupBy(_._1).flatMap { case (_, g) =>
      val t0 = g.filter(_._3 == "signup").map(_._2).minOption
      val t1 = g.filter(e => e._3 == "purchase" && e._4 >= 200.0).map(_._2).minOption
      (t0, t1) match {
        case (Some(a), Some(b)) if b >= a => Some(b - a)
        case _ => None
      }
    }.toSeq
    val sorted = perUser.sorted; val n = sorted.size
    def cut(p: Double): Long = sorted(math.ceil(n * p).toLong.toInt - 1)
    val r = queries.AnalyticsQueries.qTimeToConvert(spark, sfDir).collect().head
    assert(r.getLong(0) === n.toLong)
    assert(r.getLong(1) === cut(0.5))
    assert(r.getLong(2) === cut(0.9))
    assert(r.getLong(3) === cut(0.99))
    assert(n > 0 && n < eventsMs().map(_._1).distinct.size) // a real subset converts
  }
}
