package graft

import org.apache.spark.sql.functions._

class TopKAggSpec extends SparkSpec {
  import spark.implicits._

  test("graft_topk returns k best payloads per key, descending, map-side bounded") {
    val df = Seq(
      ("a", 3L, "a3"), ("a", 1L, "a1"), ("a", 9L, "a9"), ("a", 7L, "a7"),
      ("b", 5L, "b5"), ("b", 2L, "b2")
    ).toDF("k", "ord", "name").repartition(4) // force partial/merge paths

    val out = df.groupBy("k")
      .agg(call_function("graft_topk", lit(2), array(col("ord")), struct(col("ord"), col("name"))).as("top"))
      .select(col("k"), col("top"))
      .orderBy("k").collect()

    val a = out(0).getSeq[org.apache.spark.sql.Row](1)
    assert(a.map(_.getString(1)) == Seq("a9", "a7"))
    val b = out(1).getSeq[org.apache.spark.sql.Row](1)
    assert(b.map(_.getString(1)) == Seq("b5", "b2"))
  }

  test("graft_topk top-1 matches the window row_number formulation on real data") {
    val orders = GraftSession.table(spark, sfDir, "orders")
    val viaAgg = orders.groupBy("o_custkey")
      .agg(call_function("graft_topk", lit(1),
        array(unix_millis(col("o_orderdate").cast("timestamp")), col("o_orderkey")),
        struct(col("o_orderkey"), col("o_totalprice"))).as("top"))
      .select(col("o_custkey"), element_at(col("top"), 1).getField("o_orderkey").as("o_orderkey"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

    val viaWindow = graft.queries.AnalyticsQueries.qWindowTopn(spark, sfDir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaAgg == viaWindow)
  }

  test("lexicographic ordering across multiple ord components") {
    val df = Seq(("k", 1L, 9L, "low-major"), ("k", 2L, 0L, "high-major")).toDF("k", "m", "n", "tag")
    val out = df.groupBy("k")
      .agg(call_function("graft_topk", lit(1), array(col("m"), col("n")), struct(col("tag"))).as("t"))
      .select(element_at(col("t"), 1).getField("tag")).first().getString(0)
    assert(out == "high-major")
  }
}
