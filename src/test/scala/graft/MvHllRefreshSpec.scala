package graft

import graft.operators.Sketch
import org.apache.spark.sql.functions._

/** Sketch-MV maintenance ([[Sketch.hllRegistersBy]]/[[Sketch.hllMergeBy]],
  * `q_mv_hll_refresh`): merge algebra, the refresh ≡ rebuild law, and
  * estimate fidelity against true per-day distincts.
  */
class MvHllRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("grouped registers: per-group bucket max, self-describing p") {
    val df = Seq(("a", 1L), ("a", 1L), ("a", 2L), ("b", 1L)).toDF("g", "k")
    val regs = Sketch.hllRegistersBy(df, Seq("g"), "k").collect()
    // duplicates of a key never add registers; groups are independent
    val byG = regs.groupBy(_.getString(0)).view.mapValues(_.length).toMap
    assert(byG("a") <= 2 && byG("b") === 1)
    assert(regs.forall(_.getInt(3) === 12))
  }

  test("mergeBy is associative and idempotent (merge with self is identity)") {
    val df = (1L to 200L).map(k => ("g", k)).toDF("g", "k")
    val r = Sketch.hllRegistersBy(df, Seq("g"), "k")
    val self = Sketch.hllMergeBy(r, r, Seq("g"))
      .orderBy("bucket").collect().map(x => (x.getInt(1), x.getInt(2))).toSeq
    val base = r.orderBy("bucket").collect().map(x => (x.getInt(1), x.getInt(2))).toSeq
    assert(self === base)
  }

  test("q_mv_hll_refresh: refresh equals a rebuild over everything, bitwise") {
    val refreshed = graft.queries.AnalyticsQueries.qMvHllRefresh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    val all = raw.select(col("user_id"), GraftSession.eventTsMs(raw).as("ts_ms"))
      .withColumn("day", expr("ts_ms div 86400000"))
    val rebuild = Sketch.hllRegistersBy(all, Seq("day"), "user_id")
      .orderBy("day", "bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3))).toSeq
    assert(refreshed === rebuild)
    // estimate fidelity on the busiest day: within 15% of the true distinct
    val busiest = all.groupBy("day").agg(countDistinct("user_id").as("d"))
      .orderBy(desc("d"), asc("day")).head()
    val (day, truth) = (busiest.getLong(0), busiest.getLong(1))
    val est = Sketch.hllEstimate(
      graft.queries.AnalyticsQueries.qMvHllRefresh(spark, sfDir)
        .filter(col("day") === day).drop("day"))
    assert(math.abs(est - truth) / truth < 0.15, s"day $day est $est truth $truth")
  }
}
