package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.functions.col

class RangeJoinSpec extends SparkSpec {
  import spark.implicits._

  test("band join equals the naive inequality join, including bucket-boundary matches") {
    val left = Seq(("u", 0L, "l0"), ("u", 95L, "l95"), ("v", 50L, "lv")).toDF("k", "t", "ltag")
    val right = Seq(
      ("u", 0L, "r0"), ("u", 10L, "r10"), ("u", 100L, "r100"),
      ("u", 101L, "r101"), ("v", 49L, "r49")
    ).toDF("k", "rt", "rtag")

    val band = RangeJoin.bandJoin(left, right, "k", "t", "rt", lo = 0L, hi = 10L)
      .select("ltag", "rtag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    val naive = left.join(right,
        left("k") === right("k") && col("rt") >= col("t") && col("rt") <= col("t") + 10)
      .select("ltag", "rtag").collect().map(r => (r.getString(0), r.getString(1))).toSet
    assert(band == naive)
    assert(band == Set(("l0", "r0"), ("l0", "r10"), ("l95", "r100"), ("l95", "r101")))
  }

  test("band join produces no duplicate pairs despite double-bucketed right rows") {
    val left = Seq(("k", 10L)).toDF("k", "t")
    val right = Seq(("k", 15L)).toDF("k", "rt")
    val out = RangeJoin.bandJoin(left, right, "k", "t", "rt", 0L, 20L).collect()
    assert(out.length == 1)
  }
}
