package graft

import graft.queries.AnalyticsQueries
import graft.streaming.StreamSessionize
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Native session_window sessionization: the exact-gap boundary semantics
  * the `q_session_window` oracle encodes (touching windows MERGE; only
  * `diff > gap` splits — the qEventsSessionize rule), equivalence of the
  * window-merge formulation with the lag/island formulation on real
  * events, and the streaming settled-output ≡ batch contract.
  */
class SessionWindowSpec extends SparkSpec {
  import spark.implicits._

  private val gap = StreamSessionize.GapMs

  test("boundary semantics: exactly gap merges (touching windows combine), gap+1 splits") {
    val rows = Seq((1L, 0L, 1L), (1L, gap, 1L),         // touch ⟹ merge
                   (2L, 0L, 1L), (2L, gap + 1, 1L))     // beyond ⟹ split
      .toDF("user_id", "ts_ms", "value_u")
      .withColumn("ts", timestamp_millis(col("ts_ms")))
      .groupBy(session_window(col("ts"), "30 minutes").as("sw"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select(col("user_id"), unix_millis(col("sw.start")).as("st"),
        unix_millis(col("sw.end")).as("en"), col("n"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(rows == Set(
      (1L, 0L, 2 * gap, 2L),
      (2L, 0L, gap, 1L), (2L, gap + 1, 2 * gap + 1, 1L)))
  }

  test("q_session_window ≡ the lag/island formulation (> gap) on real events") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val byUser = Window.partitionBy("user_id").orderBy("ts_ms", "event_id")
    val ref = raw
      .select(col("event_id"), col("user_id"), GraftSession.eventTsMs(raw).as("ts_ms"),
        col("value").cast("decimal(12,2)").as("v"))
      .withColumn("new_sess",
        when(col("ts_ms") - lag("ts_ms", 1).over(byUser) > gap, 1).otherwise(0))
      .withColumn("sid", sum("new_sess").over(byUser))
      .groupBy("user_id", "sid")
      .agg(min("ts_ms").as("session_start_ms"),
        (max("ts_ms") + gap).as("session_end_ms"),
        count(lit(1)).as("n_events"), sum("v").cast("double").as("total_value"))
      .drop("sid")
    val got = AnalyticsQueries.qSessionWindow(spark, sfDir)
    assert(got.count() > 0)
    assert(got.exceptAll(ref).isEmpty && ref.exceptAll(got).isEmpty,
      "session_window frame != island formulation")
  }

  /** Feed rows + a far-future watermark sentinel, return settled sessions
    * minus the sentinel user.
    */
  private def settle(rows: Seq[(Long, Long, Long)], name: String): Set[(Long, Long, Long, Long, Long)] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "value_u")
    val q = StreamSessionize.sessionize(ev)
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(rows: _*)
      q.processAllAvailable()
      val far = rows.map(_._2).max + 400L * 86400000L
      in.addData((-1L, far, 0L))
      q.processAllAvailable()
      in.addData((-1L, far + 86400000L, 0L)) // second advance: emit everything closed
      q.processAllAvailable()
      spark.table(name).filter(col("user_id") >= 0)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4))).toSet
    } finally q.stop()
  }

  test("streaming settled output ≡ batch session_window on the real events table") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), GraftSession.eventTsMs(raw).as("ts_ms"),
      round(col("value") * 1000000.0).cast("long").as("value_u"))
    val rows = ev.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val streamed = settle(rows, "sw_real")
    val batch = StreamSessionize.sessionize(ev) // same code path, batch mode
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(streamed == batch)
  }

  test("event later than the watermark bound is dropped, not resurrected") {
    implicit val sq = spark.sqlContext
    val base = 400L * 86400000L
    val in = MemoryStream[(Long, Long, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "value_u")
    val q = StreamSessionize.sessionize(ev)
      .writeStream.format("memory").queryName("sw_late").outputMode("append").start()
    try {
      in.addData((1L, base, 5L))
      q.processAllAvailable()
      in.addData((2L, base + 30L * 86400000L, 7L)) // advances watermark a month
      q.processAllAvailable()
      in.addData((3L, base + 10L, 9L)) // a month late: dropped
      q.processAllAvailable()
      in.addData((4L, base + 60L * 86400000L, 1L)) // close user-2's session
      q.processAllAvailable()
      val users = spark.table("sw_late").select("user_id")
        .collect().map(_.getLong(0)).toSet
      assert(users.contains(1L) && users.contains(2L) && !users.contains(3L))
    } finally q.stop()
  }
}
