package graft

import java.sql.Timestamp

import graft.operators.Rfm

/** RFM segmentation ([[graft.operators.Rfm.rfm]]): fixture and real-orders
  * runs against a driver model that replays the exact pinned semantics
  * (micro-unit spend, epoch-micro recency, ⌈p·n⌉ histogram cuts as the
  * same IEEE double product).
  */
class RfmSpec extends SparkSpec {
  import spark.implicits._

  private def cut(vs: Seq[Long], p: Double): Long = {
    val sorted = vs.sorted
    sorted(math.ceil(vs.size * p).toInt - 1)
  }
  private def quint(v: Long, cuts: Seq[Long]) = 1 + cuts.count(v > _)
  private val ps = Seq(0.2, 0.4, 0.6, 0.8)

  private def model(rows: Seq[(Long, Long, Double)]): Map[Long, (Long, Long, Long, Int, Int, Int, Int)] = {
    val base = rows.groupBy(_._1).map { case (c, g) =>
      (c, g.map(_._2).max, g.size.toLong, g.map(r => math.round(r._3 * 1e6)).sum)
    }.toSeq
    val gmax = base.map(_._2).max
    val wr = base.map { case (c, last, f, m) => (c, (gmax - last) / 86400000000L, f, m) }
    val rc = ps.map(cut(wr.map(_._2), _))
    val fc = ps.map(cut(wr.map(_._3), _))
    val mc = ps.map(cut(wr.map(_._4), _))
    wr.map { case (c, r, f, m) =>
      val (rs, fs, ms) = (6 - quint(r, rc), quint(f, fc), quint(m, mc))
      c -> ((r, f, m, rs, fs, ms, rs * 100 + fs * 10 + ms))
    }.toMap
  }

  private def collectRfm(df: org.apache.spark.sql.DataFrame) =
    df.collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3),
      r.getInt(4), r.getInt(5), r.getInt(6), r.getInt(7)))).toMap

  test("fixture: one-order customers spread spend and recency; ties score equal") {
    val rows = (1 to 5).map { i =>
      (i.toLong, Timestamp.valueOf(s"2024-01-0$i 00:00:00"), i * 10.0)
    } :+ ((5L, Timestamp.valueOf("2024-01-05 00:00:00"), 10.0)) // a repeat buyer
    val df = rows.toDF("c", "ts", "amt")
    val got = collectRfm(Rfm.rfm(df, "c", "ts", "amt").orderBy("cust"))
    val want = model(rows.map { case (c, ts, a) => (c, ts.getTime * 1000L, a) })
    assert(got === want)
    // the repeat buyer is the only f-outlier, so it must hold the top f score
    assert(got(5L)._5 === got.values.map(_._5).max)
    // most recent + biggest spender: customer 5 tops r and m as well
    assert(got(5L)._4 === got.values.map(_._4).max)
    assert(got.values.forall(v => v._4 >= 1 && v._4 <= 5 && v._5 >= 1 && v._5 <= 5 && v._6 >= 1 && v._6 <= 5))
  }

  test("real orders: scores match the driver model") {
    val raw = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_custkey", "o_orderdate", "o_totalprice").collect()
      .map { r =>
        val t = r.getAs[java.time.LocalDateTime](1)
        (r.getLong(0),
          t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L + t.getNano / 1000L,
          r.getDouble(2))
      }
    val got = collectRfm(graft.queries.AnalyticsQueries.qRfm(spark, sfDir))
    assert(got === model(raw.toSeq))
    assert(got.values.map(_._4).toSet.size > 1) // quintiles actually spread
  }
}
