package graft

/** Cohort LTV (`qCohortLtv`): real-events driver model replaying the
  * cohorting, micro-unit revenue, and running cumulative exactly.
  */
class CohortLtvSpec extends SparkSpec {

  test("matrix matches a driver model; cumulative is monotone per cohort") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("user_id", "ts", "event_type", "value").collect()
      .map(r => (r.getLong(0),
        r.getAs[java.time.LocalDateTime](1).toInstant(java.time.ZoneOffset.UTC).toEpochMilli
          / 604800000L,
        r.getString(2), r.getDouble(3)))
    val cohort = ev.groupBy(_._1).map { case (u, g) => u -> g.map(_._2).min }
    val sizes = cohort.values.groupBy(identity).map { case (w, xs) => w -> xs.size.toLong }
    val cells = ev.filter(_._3 == "purchase")
      .map(e => ((cohort(e._1), e._2 - cohort(e._1)), (1L, math.round(e._4 * 1e6))))
      .groupBy(_._1).map { case (k, xs) =>
        k -> ((xs.map(_._2._1).sum, xs.map(_._2._2).sum))
      }
    val model = cells.keys.groupBy(_._1).flatMap { case (cw, ks) =>
      val ordered = ks.toSeq.sortBy(_._2)
      var cum = 0L
      ordered.map { k =>
        val (n, rev) = cells(k)
        cum += rev
        (cw, k._2, sizes(cw), n, rev, cum, cum.toDouble / sizes(cw))
      }
    }.toSet
    val got = queries.AnalyticsQueries.qCohortLtv(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDouble(6))).toSet
    assert(got === model)
    // cumulative per cohort is monotone and ends at the cohort's total
    got.groupBy(_._1).foreach { case (_, rows) =>
      val ordered = rows.toSeq.sortBy(_._2)
      assert(ordered.map(_._6) === ordered.map(_._5).scanLeft(0L)(_ + _).tail)
    }
  }
}
