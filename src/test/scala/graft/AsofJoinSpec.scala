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

  test("differential: random data matches the in-memory reference model") {
    val rnd = new scala.util.Random(13)
    (1 to 5).foreach { trial =>
      val keys = Seq("a", "b", "c", "d")
      val left = Seq.fill(120)((keys(rnd.nextInt(4)), rnd.nextInt(200).toLong, rnd.nextInt(1000)))
      // right unique per (key, time) — the operator's documented contract
      val right = Seq.fill(150)((keys(rnd.nextInt(4)), rnd.nextInt(200).toLong, rnd.nextDouble()))
        .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
      val got = AsofJoin.join(
          left.toDF("k", "t", "v"), right.toDF("k", "rt", "rv"), "k", "t", "rt", Seq("rt", "rv"))
        .select("k", "t", "v", "rt", "rv")
        .collect()
        .map(r => (r.getString(0), r.getLong(1), r.getInt(2),
          Option(r.get(3)).map(_.asInstanceOf[Long]), Option(r.get(4)).map(_.asInstanceOf[Double])))
        .sortBy(_.toString)
      val want = left.map { case (k, t, v) =>
        val m = right.filter(r => r._1 == k && r._2 <= t).sortBy(_._2).lastOption
        (k, t, v, m.map(_._2), m.map(_._3))
      }.sortBy(_.toString)
      assert(got.toSeq == want, s"trial $trial")
    }
  }

  test("payload columns always come from the SAME matched right row") {
    val left = Seq(("k", 100L, "L")).toDF("k", "t", "tag")
    val right = Seq(("k", 10L, Some("old"), Some(1.0)), ("k", 50L, None, Some(2.0)))
      .toDF("k", "t", "name", "v")
    val out = AsofJoin.join(left, right, "k", "t", "t", Seq("name", "v")).collect().head
    // match is the t=50 row: name must be null (not leaked from t=10), v = 2.0
    assert(out.getAs[String]("name") == null && out.getAs[Double]("v") == 2.0)
  }

  test("joinForward: smallest right >= left; equal time matches; none after -> nulls") {
    val left = Seq(("a", 10L, 1), ("a", 25L, 2), ("a", 30L, 3), ("a", 99L, 4), ("b", 5L, 5))
      .toDF("k", "t", "v")
    val right = Seq(("a", 8L, 0.8), ("a", 25L, 2.5), ("a", 40L, 4.0), ("c", 1L, 9.9))
      .toDF("k", "rt", "rv")
    val got = AsofJoin.joinForward(left, right, "k", "t", "rt", Seq("rt", "rv"))
      .collect().map(r => (r.getString(0), r.getLong(1),
        Option(r.get(3)).map(_.asInstanceOf[Long]))).toSet
    assert(got == Set(
      ("a", 10L, Some(25L)),  // next at-or-after 10 is 25
      ("a", 25L, Some(25L)),  // equal time matches (">=")
      ("a", 30L, Some(40L)),
      ("a", 99L, None),       // nothing after -> nulls
      ("b", 5L, None)))       // key with no right rows
  }

  test("joinForward mirrors join under time negation") {
    // forward(t) == backward(-t): randomized identity over shared keys
    val rnd = new scala.util.Random(7)
    val left = Seq.tabulate(40)(i => (s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong, i))
    val right = Seq.tabulate(30)(i => (s"k${rnd.nextInt(4)}", rnd.nextInt(100).toLong, i.toDouble))
      .groupBy(r => (r._1, r._2)).map(_._2.head).toSeq
    val fwd = AsofJoin.joinForward(
        left.toDF("k", "t", "v"), right.toDF("k", "rt", "rv"), "k", "t", "rt", Seq("rt", "rv"))
      .collect().map(r => (r.getString(0), r.getLong(1), Option(r.get(4)))).toSet
    val bwd = AsofJoin.join(
        left.map { case (k, t, v) => (k, -t, v) }.toDF("k", "t", "v"),
        right.map { case (k, t, v) => (k, -t, v) }.toDF("k", "rt", "rv"),
        "k", "t", "rt", Seq("rt", "rv"))
      .collect().map(r => (r.getString(0), -r.getLong(1), Option(r.get(4)))).toSet
    assert(fwd == bwd)
  }
}
