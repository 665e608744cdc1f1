package graft

/** Session entry paths (`qSessionPaths`): driver model replaying the
  * 30-min-gap sessionization, the first-5 cap, and the top-20 ordering.
  */
class SessionPathsSpec extends SparkSpec {

  test("top-20 entry paths match a driver model of the gap sessionization") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "event_id", "ts", "event_type").collect()
      .map(r => (r.getLong(0), r.getLong(1),
        r.getAs[java.time.LocalDateTime](2).toInstant(java.time.ZoneOffset.UTC).toEpochMilli,
        r.getString(3)))
    val paths = ev.groupBy(_._1).toSeq.flatMap { case (_, g) =>
      val ordered = g.sortBy(e => (e._3, e._2))
      // split into sessions on >30min gaps
      val sessions = ordered.foldLeft(Vector.empty[Vector[(Long, Long, Long, String)]]) {
        case (acc, e) =>
          if (acc.nonEmpty && e._3 - acc.last.last._3 <= 1800000L) acc.init :+ (acc.last :+ e)
          else acc :+ Vector(e)
      }
      sessions.map(s => s.take(5).map(_._4).mkString(">"))
    }
    val model = paths.groupBy(identity).map { case (p, xs) => p -> xs.size.toLong }
      .toSeq.sortBy { case (p, n) => (-n, p) }.take(20)
    val got = queries.AnalyticsQueries.qSessionPaths(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1))).toSeq
    assert(got === model)
    assert(got.nonEmpty)
  }
}
