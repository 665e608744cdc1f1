package graft

import java.sql.Timestamp

import graft.operators.Profile

/** Data-profiling report ([[graft.operators.Profile]]): hand-model fixture
  * with every normalization class (int, double→micro, timestamp→micros,
  * string) plus nulls and duplicates; then the real orders table against a
  * collected driver model.
  */
class ProfileSpec extends SparkSpec {
  import spark.implicits._

  private def rows(df: org.apache.spark.sql.DataFrame) =
    df.orderBy("col_name").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        if (r.isNullAt(4)) None else Some(r.getLong(4)),
        if (r.isNullAt(5)) None else Some(r.getLong(5)),
        Option(r.getString(6)), Option(r.getString(7)))).toSeq

  test("planted fixture: nulls, dups, negatives, timestamps match the hand model") {
    val t1 = Timestamp.valueOf("2024-01-01 00:00:00")
    val t2 = Timestamp.valueOf("2024-01-02 03:04:05.123456")
    val df = Seq(
      (1L, Option(2.5), Option("b"), Option(t1)),
      (2L, Option(-1.25), Option.empty[String], Option(t2)),
      (3L, Option.empty[Double], Option("a"), Option.empty[Timestamp]),
      (4L, Option(2.5), Option("a"), Option(t1))
    ).toDF("id", "x", "s", "t")
    val got = rows(Profile.profile(df))
    val e1 = t1.getTime * 1000L
    val e2 = t2.getTime * 1000L + 456L // getTime drops sub-ms
    assert(got === Seq(
      ("id", 4L, 0L, 4L, Some(1L), Some(4L), None, None),
      ("s", 4L, 1L, 2L, None, None, Some("a"), Some("b")),
      ("t", 4L, 1L, 2L, Some(e1), Some(e2), None, None),
      ("x", 4L, 1L, 2L, Some(-1250000L), Some(2500000L), None, None)))
  }

  test("orders profile matches a driver model over the collected table") {
    val raw = spark.read.parquet(s"$sfDir/orders.parquet").collect()
    val n = raw.length.toLong
    def numModel(name: String, vs: Seq[Long]) =
      (name, n, n - vs.size, vs.distinct.size.toLong, Some(vs.min), Some(vs.max),
        Option.empty[String], Option.empty[String])
    def strModel(name: String, vs: Seq[String]) =
      (name, n, n - vs.size, vs.distinct.size.toLong, Option.empty[Long],
        Option.empty[Long], Some(vs.min), Some(vs.max))
    val model = Seq(
      numModel("o_custkey", raw.map(_.getLong(1)).toSeq),
      strModel("o_orderpriority", raw.map(_.getString(5)).toSeq),
      numModel("o_orderdate", raw.map(_.getAs[java.time.LocalDateTime](4))
        .map(t => t.toInstant(java.time.ZoneOffset.UTC).getEpochSecond * 1000000L +
          t.getNano / 1000L).toSeq),
      numModel("o_orderkey", raw.map(_.getLong(0)).toSeq),
      strModel("o_orderstatus", raw.map(_.getString(2)).toSeq),
      numModel("o_totalprice", raw.map(r => math.round(r.getDouble(3) * 1e6)).toSeq)
    ).sortBy(_._1)
    val got = rows(graft.queries.SourceQueries.qProfile(spark, sfDir))
    assert(got === model)
  }
}
