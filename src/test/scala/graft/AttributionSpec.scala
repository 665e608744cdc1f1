package graft

import graft.operators.Caches
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Last-touch attribution tie rules and the Q17-shape exact-integer
  * threshold — the two places a naive formulation silently diverges.
  */
class AttributionSpec extends SparkSpec {
  import spark.implicits._

  private def lastTouch(frame: org.apache.spark.sql.DataFrame) = {
    val w = Window.partitionBy("user_id")
      .orderBy(col("ts_ms"), col("isp"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    frame.withColumn("lt", last(col("touch"), ignoreNulls = true).over(w))
      .filter(col("isp") === 1)
      .select(col("event_id"),
        when(col("lt").isNotNull && col("ts_ms") - col("lt.tts") <= 7L * 86400000L,
          col("lt.ttype")).otherwise(lit("none")).as("touch_type"))
  }

  private def row(user: Long, ts: Long, id: Long, isp: Int, ttype: String) =
    (user, ts, id, isp, if (isp == 0) Some((ts, ttype)) else None)

  test("same-instant touch counts; one-instant ties break by highest event id; 7-day cutoff") {
    val day = 86400000L
    val frame = Seq(
      row(1L, 100L, 1L, 0, "view"),   // earlier touch
      row(1L, 200L, 2L, 0, "click"),  // same instant as purchase → counts
      row(1L, 200L, 3L, 1, null),     // purchase at 200 → click
      row(2L, 100L, 4L, 0, "view"),   // two touches at one instant:
      row(2L, 100L, 5L, 0, "click"),  // higher id (click) wins the tie
      row(2L, 150L, 6L, 1, null),
      row(3L, 0L, 7L, 0, "click"),
      row(3L, 8L * day, 8L, 1, null), // 8 days later → none
      row(4L, 50L, 9L, 1, null)       // no touch at all → none
    ).toDF("user_id", "ts_ms", "event_id", "isp", "touch")
      .withColumn("touch", when(col("isp") === 0,
        struct(col("touch._1").as("tts"), col("touch._2").as("ttype"))))
    val got = lastTouch(frame).collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(3L -> "click", 6L -> "click", 8L -> "none", 9L -> "none"))
  }

  test("attribution buckets partition all purchases; revenue conserved") {
    val out = AnalyticsQueries.qAttribution(spark, sfDir).collect()
    Caches.release()
    val ev = spark.read.parquet(s"$sfDir/events.parquet")
      .filter(col("event_type") === "purchase")
    val nP = ev.count()
    val rev = ev.agg(sum(round(col("value") * 1000000.0).cast("long"))).first().getLong(0)
    assert(out.map(_.getLong(1)).sum == nP)
    assert(out.map(_.getLong(2)).sum == rev)
  }

  test("q17 threshold is strict and exact: qty at exactly 0.2*avg is excluded") {
    // part with quantities (1, 4, 4, 4, 4, 4, 4): avg = 25/7; 0.2*avg = 5/7;
    // only qty below 5/7 qualifies → none. Part 2: (1, 9): avg 5, 0.2*avg
    // = 1 → qty 1 is NOT < 1 (strict) → none. Part 3: (1, 100): 0.2*avg =
    // 10.1 → qty 1 qualifies.
    val li = Seq(
      (1L, 1L, 100L), (1L, 4L, 100L), (1L, 4L, 100L), (1L, 4L, 100L),
      (1L, 4L, 100L), (1L, 4L, 100L), (1L, 4L, 100L),
      (2L, 1L, 200L), (2L, 9L, 200L),
      (3L, 1L, 400L), (3L, 100L, 400L)
    ).toDF("pk", "qty", "cents")
    val stats = li.groupBy("pk").agg(count(lit(1)).as("cnt"), sum("qty").as("sumq"))
    val kept = li.join(stats, "pk")
      .filter(col("qty") * 5L * col("cnt") < col("sumq"))
      .collect().map(r => (r.getLong(0), r.getLong(1)))
    // part 1: 5*1*7 = 35 > 25? 35 < 25 false → excluded. 5*4*7 = 140 > 25 → excluded.
    // part 2: 5*1*2 = 10 < 10 false (strict boundary) → excluded.
    // part 3: 5*1*2 = 10 < 101 → kept.
    assert(kept.toSeq == Seq((3L, 1L)))
  }
}
