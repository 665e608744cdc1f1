package graft

import graft.operators.{Caches, Scale, Skyline}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Distributed running aggregates (Scale.runningSum / strictPrefixMax) and
  * the two operators built on them: 2-D skyline and interval-sweep
  * concurrency. Ground truth is the single-window formulation each helper
  * exists to replace (tiny data, so the single-task window is fine HERE).
  */
class SweepSkylineSpec extends SparkSpec {

  private def randFrame(n: Int, seed: Int) = {
    val rnd = new scala.util.Random(seed)
    import spark.implicits._
    (1 to n).map(i => (i.toLong, rnd.nextInt(40).toLong, rnd.nextInt(100) - 50))
      .toDF("id", "key", "v")
  }

  test("runningSum equals the single-window running sum (with heavy key ties)") {
    val df = randFrame(3000, 11)
    val got = Scale.runningSum(df, Seq("key", "id"), "v", "rs")
      .select("id", "rs").collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    Caches.release()
    val w = Window.orderBy("key", "id").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.select(col("id"), sum(col("v").cast("long")).over(w).as("rs"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("strictPrefixMax equals the strictly-preceding window max, null at the front") {
    // unique order keys (the helper's contract: aggregate first)
    val df = randFrame(2000, 7).groupBy("key").agg(max("v").as("v"))
    val got = Scale.strictPrefixMax(df, Seq("key"), "v", "pm")
      .select("key", "pm").collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    Caches.release()
    val w = Window.orderBy("key").rowsBetween(Window.unboundedPreceding, -1)
    val want = df.select(col("key"), max(col("v").cast("long")).over(w).as("pm"))
      .collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) None else Some(r.getLong(1)))).toMap
    assert(got == want)
    assert(got.values.exists(_.isEmpty), "first key must see null (nothing precedes)")
  }

  test("pareto2d equals brute-force dominance, ties survive together") {
    val rnd = new scala.util.Random(3)
    import spark.implicits._
    // duplicate points + shared prices force every tie branch
    val pts = (1 to 400).map(i => (i.toLong, rnd.nextInt(30).toDouble, rnd.nextInt(30))) ++
      Seq((401L, 5.0, 25), (402L, 5.0, 25)) // exact duplicate pair
    val df = pts.toDF("id", "price", "sz")
    val got = Skyline.pareto2d(df, "price", "sz").select("id").collect().map(_.getLong(0)).toSet
    Caches.release()
    val want = pts.filter { case (_, p, s) =>
      !pts.exists { case (_, qp, qs) => qp <= p && qs >= s && (qp < p || qs > s) }
    }.map(_._1).toSet
    assert(got == want)
    assert(want.nonEmpty)
    // if one of the duplicates survives, both must (no strict dominator)
    assert(got.contains(401L) == got.contains(402L))
  }

  test("interval sweep: ends apply before starts at the same instant") {
    import spark.implicits._
    // [1,5] [2,5] [5,9]: at t=5 two intervals close and one opens — the
    // half-open convention keeps the peak at 2, not 3
    val iv = Seq((1L, 5L), (2L, 5L), (5L, 9L)).toDF("s", "e")
    val ev = iv.select(col("s").as("ts"), lit(1).as("delta"))
      .unionByName(iv.select(col("e").as("ts"), lit(-1).as("delta")))
    val peaks = Scale.runningSum(ev, Seq("ts", "delta"), "delta", "open")
      .agg(max("open")).first().getLong(0)
    Caches.release()
    assert(peaks == 2L)
  }
}
