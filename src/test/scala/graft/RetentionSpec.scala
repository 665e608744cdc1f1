package graft

import graft.queries.AnalyticsQueries
import java.sql.Timestamp

/** Weekly cohort retention (`qRetention`): a planted-events fixture pins
  * the cohorting and offsets exactly; the real events table matches a
  * driver model; offset-0 rows price to exactly 1.0.
  */
class RetentionSpec extends SparkSpec {
  import spark.implicits._

  private val weekMs = 604800000L

  test("planted cohorts produce the exact matrix") {
    // u1: cohort week 0, active weeks 0,1,3; u2: week 0 only;
    // u3: cohort week 1, active weeks 1,2 (plus a same-week repeat event)
    val rows = Seq(
      (1L, 0L * weekMs + 1000), (1L, 1L * weekMs + 5), (1L, 3L * weekMs + 99),
      (2L, 0L * weekMs + 42),
      (3L, 1L * weekMs + 7), (3L, 1L * weekMs + 8), (3L, 2L * weekMs + 9))
      .map { case (u, ms) => (u, new Timestamp(ms)) }
    val dir = java.nio.file.Files.createTempDirectory("retention").toString
    rows.toDF("user_id", "ts").write.parquet(s"$dir/events.parquet")
    val got = AnalyticsQueries.qRetention(spark, dir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got === Map(
      (0L, 0L) -> ((2L, 1.0)), (0L, 1L) -> ((1L, 0.5)), (0L, 3L) -> ((1L, 0.5)),
      (1L, 0L) -> ((1L, 1.0)), (1L, 1L) -> ((1L, 1.0))))
  }

  test("matrix matches a driver model on the real events table; offset 0 is exactly 1.0") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(org.apache.spark.sql.functions.col("user_id"),
        GraftSession.eventTsMs(raw).as("ms")).collect()
      .map(r => (r.getLong(0), Math.floorDiv(r.getLong(1), weekMs)))
      .distinct
    val first = ev.groupBy(_._1).map { case (u, ws) => u -> ws.map(_._2).min }
    val expected = ev.groupBy { case (u, w) => (first(u), w - first(u)) }
      .map { case (k, g) => k -> g.size.toLong }
    val sizes = expected.collect { case ((c, 0L), n) => c -> n }
    val got = AnalyticsQueries.qRetention(spark, sfDir)
      .collect().map(r => ((r.getLong(0), r.getLong(1)), (r.getLong(2), r.getDouble(3)))).toMap
    assert(got.view.mapValues(_._1).toMap === expected)
    for (((c, off), (n, ret)) <- got) {
      assert(ret === n.toDouble / sizes(c), s"cohort=$c offset=$off")
      if (off == 0L) assert(ret === 1.0)
    }
  }
}
