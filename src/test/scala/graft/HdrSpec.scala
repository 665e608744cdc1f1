package graft

import graft.operators.Hdr
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Log2-linear quantile sketch (`Hdr`): bucket math vs a BigInt driver
  * model, the bitwise refresh ≡ rebuild MV contract, and the quantile
  * read's bucket-bound guarantee against exact driver percentiles.
  */
class HdrSpec extends SparkSpec {
  import spark.implicits._

  private val s = 5
  private def msb(v: Long): Int = 63 - java.lang.Long.numberOfLeadingZeros(v)
  private def bucketRef(v: Long): Long =
    if (v < (1L << s)) v
    else (msb(v) - s).toLong * (1L << s) + (v >> (msb(v) - s))
  private def lowerRef(i: Long): Long =
    if (i < (1L << s)) i
    else { val block = i >> s; (i - (block - 1) * (1L << s)) << (block - 1).toInt }

  test("bucketOf/lowerBound match the bit-twiddling model; buckets are sound") {
    val vs = (0L to 1000L) ++ Seq(1L << 20, (1L << 20) + 17, 857000000L,
      555285000000L, (1L << 40) - 1, 1L << 40)
    val got = vs.toDF("v")
      .select(col("v"), Hdr.bucketOf(col("v"), s).as("b"))
      .withColumn("lo", Hdr.lowerBound(col("b"), s))
      .withColumn("hi", Hdr.lowerBound(col("b") + 1, s))
      .collect()
    got.foreach { r =>
      val (v, b, lo, hi) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert(b == bucketRef(v), s"bucket($v)")
      assert(lo == lowerRef(b) && hi == lowerRef(b + 1), s"bounds($v)")
      assert(lo <= v && v < hi, s"containment($v): [$lo, $hi)")
      // the DDSketch-style guarantee: bucket width / lower bound <= 2^-s
      if (v >= (1L << s)) assert(hi - lo <= (lo >> s), s"relative width($v)")
    }
    // bucket index is monotone in v
    val bs = got.sortBy(_.getLong(0)).map(_.getLong(1))
    assert(bs.zip(bs.tail).forall { case (a, b) => a <= b })
  }

  test("refresh == rebuild bitwise (the mergeable-MV contract)") {
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * lit(1000000.0)).cast("long").as("rev_u"),
        (graft.plans.NativeHash.md5Mod(col("o_orderkey").cast("string"), 10L) === 0).as("late"))
    val refreshed = Hdr.mergeBy(
        Hdr.sketchBy(o.filter(!col("late")), Seq("o_orderpriority"), "rev_u", s),
        Hdr.sketchBy(o.filter(col("late")), Seq("o_orderpriority"), "rev_u", s),
        Seq("o_orderpriority"))
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    val rebuilt = Hdr.sketchBy(o, Seq("o_orderpriority"), "rev_u", s)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSet
    assert(refreshed === rebuilt)
    assert(refreshed.nonEmpty)
  }

  test("split plan: ranges are balanced to n/parts within one bucket's mass") {
    val parts = 16
    val plan = AnalyticsQueries.qRangeSplitPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * lit(1000000.0)).cast("long").as("rev_u"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2) }
    byKey.foreach { case (k, vs) =>
      val n = vs.length.toLong
      val splits = plan.filter(_._1 == k).sortBy(_._2)
      assert(splits.map(_._2).toSeq == (1 until parts), k)
      // split values are non-decreasing; rows_le is the exact count at or
      // under the split bucket and crosses j*n/parts
      splits.sliding(2).foreach { case Array(a, b) => assert(a._3 <= b._3 && a._4 <= b._4) }
      splits.foreach { case (_, j, lb, rowsLe) =>
        assert(rowsLe * parts >= n * j, s"$k split $j undershoots")
        // the range below the split holds <= rows_le rows and rows_le
        // overshoots the target by at most one bucket's mass: everything
        // under the split's bucket upper bound counts into rows_le
        val under = vs.count(_ < lb)
        assert(under.toLong * parts < n * j + n, s"$k split $j: $under before lb")
        assert(under <= rowsLe)
      }
    }
    assert(plan.nonEmpty)
  }

  test("quantile read brackets the exact driver percentile within one bucket") {
    val rows = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderpriority"),
        round(col("o_totalprice") * lit(1000000.0)).cast("long").as("rev_u"))
      .collect().map(r => r.getString(0) -> r.getLong(1))
    val byKey = rows.groupBy(_._1).map { case (k, vs) => k -> vs.map(_._2).sorted }
    val got = AnalyticsQueries.qQuantileSketchRead(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(got.keySet == byKey.keySet)
    byKey.foreach { case (k, sorted) =>
      val (n, p50, p95, p99) = got(k)
      assert(n == sorted.length.toLong, k)
      // k-th smallest with rank = ceil(p * n) — the sketch's CDF rule
      def exact(num: Int, den: Int): Long =
        sorted(((n * num + den - 1) / den - 1).toInt)
      Seq((1, 2, p50), (19, 20, p95), (99, 100, p99)).foreach { case (num, den, lb) =>
        val e = exact(num, den)
        assert(lb == lowerRef(bucketRef(e)),
          s"$k p$num/$den: reported $lb, exact $e in bucket ${bucketRef(e)}")
        assert(lb <= e && e < lowerRef(bucketRef(e) + 1))
      }
    }
  }
}
