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

  test("differential: random bands match the naive nested-loop model") {
    val rnd = new scala.util.Random(29)
    (1 to 5).foreach { trial =>
      val keys = Seq("x", "y", "z")
      val lo = rnd.nextInt(20) - 10L
      val hi = lo + rnd.nextInt(30)
      val left = Seq.tabulate(80)(i => (keys(rnd.nextInt(3)), rnd.nextInt(300).toLong, i))
      val right = Seq.tabulate(100)(i => (keys(rnd.nextInt(3)), rnd.nextInt(300).toLong, i))
      val got = graft.operators.RangeJoin.bandJoin(
          left.toDF("k", "t", "lid"), right.toDF("k", "rt", "rid"), "k", "t", "rt", lo, hi)
        .select("lid", "rid").collect().map(r => (r.getInt(0), r.getInt(1))).sorted
      val want = (for {
        (lk, lt, lid) <- left
        (rk, rt, rid) <- right
        if lk == rk && rt >= lt + lo && rt <= lt + hi
      } yield (lid, rid)).sorted
      assert(got.toSeq == want, s"trial $trial lo=$lo hi=$hi")
    }
  }

  test("band join produces no duplicate pairs despite double-bucketed right rows") {
    val left = Seq(("k", 10L)).toDF("k", "t")
    val right = Seq(("k", 15L)).toDF("k", "rt")
    val out = RangeJoin.bandJoin(left, right, "k", "t", "rt", 0L, 20L).collect()
    assert(out.length == 1)
  }
}
