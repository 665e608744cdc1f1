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

  test("q_mv_join_refresh: two-quadrant delta refresh equals full join rebuild, bitwise") {
    val refreshed = graft.queries.AnalyticsQueries.qMvJoinRefresh(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    val rebuild = spark.read.parquet(s"$sfDir/orders.parquet")
      .join(spark.read.parquet(s"$sfDir/lineitem.parquet"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy("o_orderpriority", "l_returnflag")
      .agg(count(lit(1)).as("n_rows"),
        sum(round(col("l_extendedprice") * lit(1000000.0)).cast("long")).as("sum_u"))
      .orderBy("o_orderpriority", "l_returnflag").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3))).toSeq
    assert(refreshed === rebuild)
    // the harness split populates all four old/delta quadrants
    val o = spark.read.parquet(s"$sfDir/orders.parquet")
      .select(col("o_orderkey"),
        (graft.plans.NativeHash.md5Mod(col("o_orderkey").cast("string"), 10L) === 0).as("lo"))
    val l = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select(col("l_orderkey"),
        (graft.plans.NativeHash.md5Mod(concat_ws("-", col("l_orderkey").cast("string"),
          col("l_linenumber").cast("string")), 7L) === 0).as("ll"))
    val quads = o.join(l, col("o_orderkey") === col("l_orderkey"))
      .groupBy("lo", "ll").count().collect()
    assert(quads.length == 4, s"expected all 4 quadrants, got ${quads.mkString(",")}")
  }

  test("joinPartialDelta: keys that exist only via the delta appear in the refreshed view") {
    val aOld = Seq((1L, "p1")).toDF("k", "g")
    val aDelta = Seq((2L, "p2")).toDF("k", "g") // a key only the delta knows
    val bOld = Seq((1L, 10L), (2L, 20L)).toDF("k", "v")
    val bDelta = Seq((1L, 5L)).toDF("k", "v")
    val bNew = bOld.unionByName(bDelta)
    val mv = MvRefresh.partial(aOld.join(bOld, Seq("k")), Seq("g"), col("v"))
    val delta = MvRefresh.joinPartialDelta(aOld, aDelta, bNew, bDelta,
      Seq("k"), Seq("g"), col("v"))
    val got = MvRefresh.refresh(mv, delta, Seq("g")).orderBy("g").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // p1: old (1,10) + delta (1,5); p2 appears purely through the A-delta
    assert(got === Seq(("p1", 2L, 15L), ("p2", 1L, 20L)))
  }
}
