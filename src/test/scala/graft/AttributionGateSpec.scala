package graft

import graft.streaming.AttributionGate
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming last-touch attribution: cross-batch state carry, the pinned
  * tie rules, non-touch event types ignored, and one-batch equivalence
  * with the batch query's per-purchase credit.
  */
class AttributionGateSpec extends SparkSpec {
  import spark.implicits._

  private def run(batches: Seq[Seq[(Long, Long, Long, String, Long)]]): Map[Long, String] = {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value_u")
    val name = s"attr_out_${batches.map(_.size).sum}_${batches.size}"
    // fixture timestamps sit near the 1970 epoch across wildly different
    // "days", so park the watermark below them all: these tests pin the
    // credit semantics, not the eviction (which has its own test below)
    val q = AttributionGate.attribute(ev, lateness = "3650 days")
      .writeStream.format("memory").queryName(name).outputMode("append").start()
    try {
      batches.foreach { b => in.addData(b: _*); q.processAllAvailable() }
      spark.table(name).collect().map(r => r.getLong(1) -> r.getString(2)).toMap
    } finally q.stop()
  }

  private val day = 86400000L

  test("state carries across batches; window and tie rules match the batch query") {
    val got = run(Seq(
      Seq((1L, 100L, 1L, "view", 0L), (1L, 200L, 2L, "click", 0L)),
      Seq((1L, 300L, 3L, "purchase", 10L)),              // click carried from batch 1
      Seq((2L, 100L, 4L, "view", 0L), (2L, 100L, 5L, "click", 0L),
          (2L, 100L, 6L, "purchase", 5L)),               // same-instant: higher id (click) wins
      Seq((3L, 0L, 7L, "click", 0L)),
      Seq((3L, 8L * day, 8L, "purchase", 1L)),           // outside the 7-day window
      Seq((4L, 10L, 9L, "signup", 0L), (4L, 20L, 10L, "purchase", 2L)), // signup is not a touch
      Seq((5L, 50L, 11L, "purchase", 3L))                // no history at all
    ))
    assert(got == Map(3L -> "click", 6L -> "click", 8L -> "none",
      10L -> "none", 11L -> "none"))
  }

  test("state is evicted once the watermark passes touch + 7d (bounded to active users)") {
    implicit val sq = spark.sqlContext
    val in = MemoryStream[(Long, Long, Long, String, Long)]
    val ev = in.toDF().toDF("user_id", "ts_ms", "event_id", "event_type", "value_u")
    val q = AttributionGate.attribute(ev, lateness = "1 day")
      .writeStream.format("memory").queryName("attr_evict").outputMode("append").start()
    try {
      // base > 0: the initial watermark is epoch 0 and the event-time
      // timeout path filters rows at-or-under the watermark as late
      val base = 400L * day
      in.addData((1L, base, 1L, "click", 0L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L)
      // watermark moves to base+1d — under touch+7d, user 1's state kept
      in.addData((2L, base + 2L * day, 2L, "click", 0L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 2L)
      // watermark moves to base+19d — past user 1's timeout, cell evicted
      // (processAllAvailable includes the no-data batch the advance triggers)
      in.addData((2L, base + 20L * day, 3L, "view", 0L))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators(0).numRowsTotal == 1L)
    } finally q.stop()
  }

  test("one batch of the real stream equals the batch query's per-purchase credit") {
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val ev = raw.select(col("user_id"), GraftSession.eventTsMs(raw).as("ts_ms"),
        col("event_id"), col("event_type"),
        round(col("value") * 1000000.0).cast("long").as("value_u"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3), r.getLong(4)))
    val streamed = run(Seq(ev.toSeq))
    // batch reference: the qAttribution window applied per purchase
    val w = org.apache.spark.sql.expressions.Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("isp"), col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding,
        org.apache.spark.sql.expressions.Window.currentRow)
    val frame = ev.toSeq.toDF("user_id", "ts_ms", "event_id", "event_type", "value_u")
      .withColumn("isp", when(col("event_type") === "purchase", 1).otherwise(0))
      .withColumn("touch", when(col("event_type").isin("click", "view"),
        struct(col("ts_ms").as("tts"), col("event_type").as("ttype"))))
    val want = frame
      .filter(col("isp") === 1 || col("touch").isNotNull)
      .withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"),
        when(col("lt").isNotNull && col("ts_ms") - col("lt.tts") <= 7L * day,
          col("lt.ttype")).otherwise(lit("none")).as("t"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(streamed == want)
    assert(streamed.nonEmpty)
  }
}
