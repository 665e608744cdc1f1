package graft

import graft.operators.MvRefresh
import org.apache.spark.sql.functions._

/** Incremental MV maintenance ([[graft.operators.MvRefresh]]): merge
  * algebra on fixtures and the refresh ≡ recompute law on the real table.
  */
class MvRefreshSpec extends SparkSpec {
  import spark.implicits._

  test("merge algebra: untouched keys pass through, new keys appear, shared keys add") {
    val mv = Seq((1L, 2L, 100L), (2L, 1L, 50L)).toDF("k", "n_rows", "sum_u")
    val delta = Seq((2L, 3L, 7L), (3L, 1L, 9L)).toDF("k", "n_rows", "sum_u")
    val got = MvRefresh.refresh(mv, delta, Seq("k")).orderBy("k").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 100L), (2L, 4L, 57L), (3L, 1L, 9L)))
  }

  test("refresh is idempotent against an empty delta") {
    val mv = Seq((1L, 2L, 100L)).toDF("k", "n_rows", "sum_u")
    val empty = mv.filter(lit(false))
    val got = MvRefresh.refresh(mv, empty, Seq("k")).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq((1L, 2L, 100L)))
  }

  test("q_mv_refresh: incremental refresh equals full recompute, bitwise") {
    val refreshed = graft.queries.AnalyticsQueries.qMvRefresh(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    val recompute = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000").as("day"),
        round(col("o_totalprice") * lit(1000000.0)).cast("long").as("rev_u"))
      .groupBy("day")
      .agg(count(lit(1)).as("n_rows"), sum("rev_u").as("sum_u"))
      .orderBy("day").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(refreshed === recompute)
    // and the split is real: the delta side is non-empty
    val late = spark.read.parquet(s"$sfDir/orders.parquet")
      .filter(graft.functions.Sampling.md5Bucket(col("o_orderkey"), 10) === 0).count()
    assert(late > 0)
  }
}
