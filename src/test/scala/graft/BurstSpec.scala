package graft

/** Minute-grain burst detector (`qBurstDetect`): planted-burst fixture
  * through the same operator chain, then the real-events query against a
  * driver model.
  */
class BurstSpec extends SparkSpec {
  import spark.implicits._
  import graft.operators.Curation

  test("a planted 10x burst minute is flagged; steady minutes are not") {
    // type A: 20 steady minutes of 5 + one minute of 50; type B: all steady
    val counts = ((0L until 20L).map(m => ("A", m, 5L)) :+ (("A", 20L, 50L))) ++
      (0L until 10L).map(m => ("B", m, 7L))
    val df = counts.toDF("event_type", "minute", "cnt")
    val got = Curation.robustOutliers(df, "minute", "event_type", "cnt", k = 3)
      .collect().map(r => (r.getString(1), r.getLong(0)) -> r.getBoolean(5)).toMap
    assert(got(("A", 20L)))                        // the burst
    assert((0L until 20L).forall(m => !got(("A", m))))
    assert((0L until 10L).forall(m => !got(("B", m))))
  }

  test("real events: operator matches a driver model") {
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .select("ts", "event_type").collect()
      .map(r => (r.getAs[java.time.LocalDateTime](0)
        .toInstant(java.time.ZoneOffset.UTC).toEpochMilli / 60000L, r.getString(1)))
    val counts = ev.groupBy(identity).map { case ((m, t), g) => (t, m, g.length.toLong) }.toSeq
    def med(vs: Seq[Long]): Long = { // histogram-CDF median: min v with cdf >= ceil(n/2)
      val sorted = vs.sorted; sorted((vs.size + 1) / 2 - 1)
    }
    val model = counts.groupBy(_._1).flatMap { case (t, g) =>
      val m = med(g.map(_._3))
      val madv = med(g.map(c => math.abs(c._3 - m)))
      g.map { case (_, minute, c) =>
        (minute, t) -> ((c, m, madv, math.abs(c - m) > 3 * madv))
      }
    }
    val got = graft.queries.AnalyticsQueries.qBurstDetect(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5)))).toMap
    assert(got === model)
  }
}
