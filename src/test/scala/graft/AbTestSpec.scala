package graft

/** A/B test report (`qAbTest`): real-events run against a driver model
  * replaying the hash split, conversion rule, and the exact z² tree.
  */
class AbTestSpec extends SparkSpec {

  test("report matches a driver model; z² is finite and nonnegative") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_type", "value").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(u: Long): Int = {
      // md5Lower contract: little-endian uint64 of digest bytes 8..15, mod 2
      val b = md.digest(u.toString.getBytes("UTF-8"))
      val v = (0 until 8).map(i => BigInt(b(8 + i) & 0xff) << (8 * i)).sum
      (v % 2).toInt
    }
    val users = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      (bucket(u), if (g.exists(e => e._2 == "purchase" && e._3 >= 200.0)) 1L else 0L)
    }
    val (na, ca) = (users.count(_._1 == 0).toLong, users.filter(_._1 == 0).map(_._2).sum)
    val (nb, cb) = (users.count(_._1 == 1).toLong, users.filter(_._1 == 1).map(_._2).sum)
    val (rateA, rateB) = (ca.toDouble / na, cb.toDouble / nb)
    val lift = rateB - rateA
    val pool = (ca + cb).toDouble / (na + nb)
    val z2 = (lift * lift) / (pool * (1.0 - pool) * (1.0 / na + 1.0 / nb))
    val r = graft.queries.AnalyticsQueries.qAbTest(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)) === ((na, ca, nb, cb)))
    assert(r.getDouble(4) === rateA)
    assert(r.getDouble(5) === rateB)
    assert(r.getDouble(6) === lift)
    assert(r.getDouble(7) === z2)
    assert(!r.getDouble(7).isNaN && r.getDouble(7) >= 0.0)
  }

  test("CUPED: theta/lift/variance-reduction match a driver model on exact cents") {
    val cutoffMs = 1705276800000L
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw
      .select(raw("user_id"), raw("event_type"), raw("value"),
        graft.GraftSession.eventTsMs(raw).as("ts_ms"))
      .collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2), r.getLong(3)))
    val md = java.security.MessageDigest.getInstance("MD5")
    def bucket(u: Long): Int = {
      val b = md.digest(u.toString.getBytes("UTF-8"))
      val v = (0 until 8).map(i => BigInt(b(8 + i) & 0xff) << (8 * i)).sum
      (v % 2).toInt
    }
    val users = ev.groupBy(_._1).toSeq.map { case (u, g) =>
      def cents(pre: Boolean) = g.filter(e =>
        e._2 == "purchase" && (if (pre) e._4 < cutoffMs else e._4 >= cutoffMs))
        .map(e => math.round(e._3 * 100.0)).sum
      (bucket(u), cents(pre = true), cents(pre = false))
    }
    val n = users.length.toLong
    val (sx, sy) = (users.map(_._2).sum, users.map(_._3).sum)
    val (sxy, sx2, sy2) = (users.map(u => u._2 * u._3).sum,
      users.map(u => u._2 * u._2).sum, users.map(u => u._3 * u._3).sum)
    val a = users.filter(_._1 == 0); val b = users.filter(_._1 == 1)
    val covn = n.toDouble * sxy.toDouble - sx.toDouble * sy.toDouble
    val varxn = n.toDouble * sx2.toDouble - sx.toDouble * sx.toDouble
    val varyn = n.toDouble * sy2.toDouble - sy.toDouble * sy.toDouble
    val theta = covn / varxn
    val rawLift = b.map(_._3).sum.toDouble / b.length - a.map(_._3).sum.toDouble / a.length
    val xGap = b.map(_._2).sum.toDouble / b.length - a.map(_._2).sum.toDouble / a.length
    val r = graft.queries.AnalyticsQueries.qCuped(spark, sfDir).collect().head
    assert((r.getLong(0), r.getLong(1)) === ((a.length.toLong, b.length.toLong)))
    assert(r.getDouble(2) === rawLift)
    assert(r.getDouble(3) === theta)
    assert(r.getDouble(4) === rawLift - theta * xGap)
    assert(r.getDouble(5) === covn * covn / (varxn * varyn))
    assert(r.getDouble(5) >= 0.0 && r.getDouble(5) <= 1.0, "corr^2 must lie in [0,1]")
  }
}
