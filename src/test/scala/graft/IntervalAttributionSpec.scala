package graft

import graft.streaming.IntervalAttribution
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream event-time interval join (`IntervalAttribution`): the
  * pinned credit semantics on a closed-form fixture, settled-output
  * equivalence with the batch `q_attribution` per-purchase credit AND its
  * gated aggregate on the real events table, and the watermark-bounded
  * join-state contract.
  */
class IntervalAttributionSpec extends SparkSpec {
  import spark.implicits._

  private val day = 86400000L

  /** Feed one batch of events plus a far-future watermark sentinel (one
    * click + one purchase for user -1, so BOTH stream branches advance),
    * return the settled per-purchase credits minus the sentinel.
    */
  private def settle(events: Seq[(Long, Long, Long, String, Long)],
                     name: String): Map[Long, (String, Long)] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value_u")
    val q = IntervalAttribution.attribute(ev, lateness = "1 millisecond")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      in.addData(events: _*)
      q.processAllAvailable()
      val far = events.map(_._2).max + 30L * day
      in.addData((-1L, far, 999998L, "click", 0L), (-1L, far, 999999L, "purchase", 0L))
      q.processAllAvailable()
      spark.table(name).filter(col("user_id") >= 0)
        .collect().map(r => r.getLong(1) -> (r.getString(3), r.getLong(4))).toMap
    } finally q.stop()
  }

  test("credit semantics match the batch rules on the closed-form fixture") {
    val base = 400L * day // keep event times well above the epoch-0 initial watermark
    val got = settle(Seq(
      (1L, base + 100L, 1L, "view", 0L), (1L, base + 200L, 2L, "click", 0L),
      (1L, base + 300L, 3L, "purchase", 10L),            // most recent touch: click
      (2L, base + 100L, 4L, "view", 0L), (2L, base + 100L, 5L, "click", 0L),
      (2L, base + 100L, 6L, "purchase", 5L),             // same instant: higher id (click) wins
      (3L, base, 7L, "click", 0L),
      (3L, base + 8L * day, 8L, "purchase", 1L),         // outside the 7-day band
      (4L, base + 10L, 9L, "signup", 0L), (4L, base + 20L, 10L, "purchase", 2L), // not a touch
      (5L, base + 50L, 11L, "purchase", 3L)              // no history at all
    ), "ia_fixture")
    assert(got == Map(3L -> ("click", 10L), 6L -> ("click", 5L), 8L -> ("none", 1L),
      10L -> ("none", 2L), 11L -> ("none", 3L)))
  }

  test("settled output equals the batch q_attribution credit on the real stream") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), GraftSession.eventTsMs(raw).as("ts_ms"),
        col("event_id"), col("event_type"),
        round(col("value") * 1000000.0).cast("long").as("value_u"))
    val rows = ev.collect().map(r =>
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val streamed = settle(rows.toSeq, "ia_real")
    // batch reference: the qAttribution window applied per purchase
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("isp"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val frame = ev.filter(col("event_type").isin("click", "view"))
      .select(col("user_id"), col("ts_ms"), col("event_id"), lit(0).as("isp"),
        struct(col("ts_ms").as("tts"), col("event_type").as("ttype")).as("touch"),
        lit(null).cast("long").as("value_u"))
      .unionByName(ev.filter(col("event_type") === "purchase")
        .select(col("user_id"), col("ts_ms"), col("event_id"), lit(1).as("isp"),
          lit(null).cast("struct<tts:long,ttype:string>").as("touch"), col("value_u")))
    val batch = frame.withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("isp") === 1)
      .select(col("event_id"),
        when(col("lt").isNotNull && col("ts_ms") - col("lt.tts") <= 7L * day,
          col("lt.ttype")).otherwise(lit("none")).as("touch_type"),
        col("value_u"))
      .collect().map(r => r.getLong(0) -> (r.getString(1), r.getLong(2))).toMap
    assert(streamed == batch)
    // and the rollup equals the GATED q_attribution aggregate exactly
    val gated = queries.AnalyticsQueries.qAttribution(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val rolled = streamed.values.groupBy(_._1)
      .map { case (t, vs) => t -> (vs.size.toLong, vs.map(_._2).sum) }
    assert(rolled == gated)
  }

  test("join state is watermark-bounded: settled rows evict") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value_u")
    val q = IntervalAttribution.attribute(ev, lateness = "1 millisecond")
      .writeStream.format("memory").queryName("ia_evict").outputMode("append").start()
    try {
      val base = 400L * day
      in.addData((1L, base, 1L, "click", 0L), (1L, base + 100L, 2L, "purchase", 7L))
      q.processAllAvailable()
      val before = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(before > 0) // the band buffers both sides
      // watermark far past touch + 7d and the purchase's window end:
      // join state for batch-1 rows is provably useless and must drop
      in.addData((2L, base + 40L * day, 3L, "click", 0L),
        (2L, base + 40L * day, 4L, "purchase", 0L))
      q.processAllAvailable()
      in.addData((2L, base + 80L * day, 5L, "click", 0L),
        (2L, base + 80L * day, 6L, "purchase", 0L))
      q.processAllAvailable()
      val out = spark.table("ia_evict").collect()
        .map(r => r.getLong(1) -> r.getString(3)).toMap
      assert(out(2L) == "click" && out(4L) == "click")
      val after = q.lastProgress.stateOperators.map(_.numRowsTotal).sum
      assert(after < before + 4,
        s"state grew unbounded: $before -> $after (settled rows not evicted)")
    } finally q.stop()
  }
}
