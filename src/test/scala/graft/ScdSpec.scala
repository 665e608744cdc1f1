package graft

import graft.operators.Scd

/** SCD type-2 merge ([[graft.operators.Scd.scd2]]): a fixture covering
  * every churn class (unchanged / changed / deleted / inserted / NULL
  * attribute), then interval invariants on the real-orders query.
  */
class ScdSpec extends SparkSpec {
  import spark.implicits._

  test("fixture: unchanged, changed, deleted, inserted, and NULL attrs") {
    val old = Seq((1L, Option("a"), 10L), (2L, Option("b"), 20L),
      (3L, Option("c"), 30L), (5L, Option.empty[String], 50L))
      .toDF("k", "st", "pu")
    val nw = Seq((1L, Option("a"), 10L), (2L, Option("B"), 20L),
      (4L, Option("d"), 40L), (5L, Option.empty[String], 50L))
      .toDF("k", "st", "pu")
    val got = Scd.scd2(old, nw, "k", Seq("st", "pu"))
      .orderBy("k", "valid_from").collect()
      .map(r => (r.getLong(0), Option(r.getString(1)), r.getLong(2), r.getInt(3),
        if (r.isNullAt(4)) None else Some(r.getInt(4)), r.getBoolean(5))).toSeq
    assert(got === Seq(
      (1L, Some("a"), 10L, 0, None, true),          // unchanged: one open row
      (2L, Some("b"), 20L, 0, Some(1), false),      // changed: closed old …
      (2L, Some("B"), 20L, 1, None, true),          //          … + open new
      (3L, Some("c"), 30L, 0, Some(1), false),      // deleted: closed only
      (4L, Some("d"), 40L, 1, None, true),          // inserted: open at t1
      (5L, None, 50L, 0, None, true)))              // NULL attr: not a change
  }

  test("real orders: every surviving key has exactly one current row; intervals are well-formed") {
    val rows = graft.queries.SourceQueries.qScd2(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getInt(3), if (r.isNullAt(4)) None else Some(r.getInt(4)),
        r.getBoolean(5)))
    // interval shape: open rows have no valid_to, closed rows end at 1
    assert(rows.forall { case (_, vf, vt, cur) =>
      (cur && vt.isEmpty) || (!cur && vf == 0 && vt.contains(1))
    })
    val byKey = rows.groupBy(_._1)
    val orderKeys = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey").collect().map(_.getLong(0)).toSet
    for ((k, vs) <- byKey) {
      val curs = vs.count(_._4)
      if (k % 13 == 0 && k < 10000000L) assert(curs === 0, s"deleted key $k")
      else assert(curs === 1, s"key $k")
      assert(vs.size <= 2)
    }
    // changed keys carry both versions
    val changed = orderKeys.filter(k => k % 13 != 0 && (k % 5 == 0 || k % 7 == 0))
    assert(changed.forall(k => byKey(k).size == 2))
    // inserted keys appear shifted by 10^7, open at t1
    val inserted = orderKeys.filter(_ % 11 == 0).map(_ + 10000000L)
    assert(inserted.forall(k => byKey(k) match {
      case Array((_, 1, None, true)) => true
      case _ => false
    }))
  }
}
