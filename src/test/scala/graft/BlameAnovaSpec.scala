package graft

import graft.operators.Caches
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Sole-blame decorrelation semantics and the ANOVA F bit-contract. */
class BlameAnovaSpec extends SparkSpec {
  import spark.implicits._

  test("sole blame: only multi-supplier orders with exactly one late shipper count") {
    // order 1: two suppliers, one late → supplier 11 blamed
    // order 2: one supplier, late → excluded (no co-supplier to let down)
    // order 3: two suppliers, both late → excluded (shared blame)
    // order 4: two suppliers, none late → excluded
    val li = Seq(
      (1L, 11L, true), (1L, 12L, false),
      (2L, 11L, true),
      (3L, 13L, true), (3L, 14L, true),
      (4L, 15L, false), (4L, 16L, false)
    ).toDF("ok", "sk", "late")
    val got = li.groupBy("ok")
      .agg(countDistinct(col("sk")).as("n_supp"),
        countDistinct(when(col("late"), col("sk"))).as("n_late"),
        min(when(col("late"), col("sk"))).as("blame"))
      .filter(col("n_supp") > 1 && col("n_late") === 1)
      .groupBy("blame").agg(count(lit(1)).as("numwait"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(11L -> 1L))
  }

  test("anova F equals the BigInt driver model bit-for-bit; SSB + SSW = SST") {
    val out = AnalyticsQueries.qAnovaLag(spark, sfDir).first()
    Caches.release()
    val rows = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .join(spark.read.parquet(s"$sfDir/orders.parquet"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        (expr("unix_micros(CAST(l_shipdate AS TIMESTAMP)) div 86400000000") -
          expr("unix_micros(CAST(o_orderdate AS TIMESTAMP)) div 86400000000")).as("v"))
      .collect().map(r => r.getString(0) -> BigInt(r.getLong(1)))
    val domain = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val byG: Map[String, Seq[BigInt]] =
      rows.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
    val n = BigInt(rows.length)
    val q = rows.map(t => t._2 * t._2).sum
    // pinned left-to-right 5-term sum — the query's contract
    val ssg = domain.map { g =>
      val vs = byG.getOrElse(g, Seq.empty[BigInt])
      (vs.sum * vs.sum).toDouble / vs.length.toDouble
    }.reduce(_ + _)
    val stot = domain.map(g => byG.getOrElse(g, Seq.empty[BigInt]).sum).reduce(_ + _)
    val ssb = ssg - (stot * stot).toDouble / n.toDouble
    val ssw = q.toDouble - ssg
    val f = (ssb / 4.0) / (ssw / (n - 5).toDouble)
    assert(out.getDouble(2) == ssb)
    assert(out.getDouble(3) == ssw)
    assert(out.getDouble(4) == f)
    // partition identity within FP tolerance: SSB + SSW ≈ SST
    val mean = stot.toDouble / n.toDouble
    val sst = q.toDouble - n.toDouble * mean * mean
    assert(math.abs((ssb + ssw) - sst) / sst < 1e-9)
  }
}
