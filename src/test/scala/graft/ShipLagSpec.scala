package graft

/** Ship-lag SLA percentiles (`q_ship_lag`): exact discrete-percentile
  * driver model over the real join (the histogram-CDF engine itself is
  * pinned in CorpusStatsSpec / the robust-outlier suite).
  */
class ShipLagSpec extends SparkSpec {

  test("q_ship_lag matches a driver percentile model per priority") {
    import org.apache.spark.sql.functions.expr
    val li = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(expr("l_orderkey"),
        expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000")).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("o_orderkey"), expr("o_orderpriority"),
        expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")).collect()
      .map(r => r.getLong(0) -> ((r.getString(1), r.getLong(2)))).toMap
    val lags = li.flatMap { case (ok, sd) => o.get(ok).map { case (p, od) => (p, sd - od) } }
    def pct(vs: Seq[Long], p: Double): Long = {
      val sorted = vs.sorted
      sorted(math.ceil(sorted.size * p).toInt - 1)
    }
    val want = lags.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      .map { case (pr, vs) => (pr, pct(vs, 0.5), pct(vs, 0.9), pct(vs, 0.99)) }
      .toSeq.sortBy(_._1)
    val got = graft.queries.AnalyticsQueries.qShipLag(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got === want && got.nonEmpty)
    got.foreach { case (_, p50, p90, p99) => assert(p50 <= p90 && p90 <= p99 && p50 >= 0) }
  }
}
