package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.Row

class AsofJoinSpec extends SparkSpec {
  import spark.implicits._

  test("asof join picks the greatest right time <= left time per key") {
    val trades = Seq(("A", 10L, 100.0), ("A", 20L, 101.0), ("B", 15L, 50.0))
      .toDF("sym", "t", "px")
    val quotes = Seq(("A", 5L, 99.5), ("A", 10L, 99.9), ("A", 18L, 100.7), ("B", 99L, 1.0))
      .toDF("sym", "t", "bid")

    val out = AsofJoin.join(trades, quotes, "sym", "t", "t", Seq("bid"))
      .orderBy("sym", "t").collect()
    assert(out.toSeq == Seq(
      Row("A", 10L, 100.0, 99.9),  // equal time matches ("<=")
      Row("A", 20L, 101.0, 100.7), // latest prior
      Row("B", 15L, 50.0, null)    // nothing at-or-before → null
    ))
  }

  test("payload columns always come from the SAME matched right row") {
    val left = Seq(("k", 100L, "L")).toDF("k", "t", "tag")
    val right = Seq(("k", 10L, Some("old"), Some(1.0)), ("k", 50L, None, Some(2.0)))
      .toDF("k", "t", "name", "v")
    val out = AsofJoin.join(left, right, "k", "t", "t", Seq("name", "v")).collect().head
    // match is the t=50 row: name must be null (not leaked from t=10), v = 2.0
    assert(out.getAs[String]("name") == null && out.getAs[Double]("v") == 2.0)
  }
}
