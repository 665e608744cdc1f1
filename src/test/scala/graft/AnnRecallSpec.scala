package graft

import graft.operators.Ann

/** ANN recall report ([[Ann.recallAtK]], `q_ann_recall`): intersection
  * algebra on fixtures, and the monotonicity law the multi-table
  * construction guarantees (table 0 of 8×4 IS the 1×4 plane family, and
  * exact rescoring makes recall = |truth ∩ candidates| — monotone under
  * candidate-superset).
  */
class AnnRecallSpec extends SparkSpec {
  import spark.implicits._

  test("recallAtK counts the truth∩approx overlap per query") {
    val truth = Seq((0L, 1L), (0L, 2L), (0L, 3L), (1L, 7L), (1L, 8L))
      .toDF("query_id", "neighbor_id")
    val approx = Seq((0L, 2L), (0L, 9L), (0L, 3L), (1L, 5L))
      .toDF("query_id", "neighbor_id")
    val got = Ann.recallAtK(truth, approx).orderBy("query_id").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    assert(got === Seq((0L, 3L, 2L, 2.0 / 3.0), (1L, 2L, 0L, 0.0)))
  }

  test("recall is 1.0 when approx equals truth") {
    val t = Seq((0L, 1L), (0L, 2L)).toDF("query_id", "neighbor_id")
    val got = Ann.recallAtK(t, t).collect()
    assert(got.map(_.getDouble(3)).toSeq === Seq(1.0))
  }

  test("q_ann_recall: full truth denominators, and 8x4 recall dominates 1x4 per query") {
    val rows = graft.queries.LlmQueries.qAnnRecall(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    val byMethod = rows.groupBy(_._1)
    assert(byMethod.keySet === Set("lsh_1x4", "lsh_8x4"))
    rows.foreach { case (_, _, nTruth, nHit, recall) =>
      assert(nTruth === 10L && nHit >= 0L && nHit <= 10L)
      assert(math.abs(recall - nHit.toDouble / nTruth) < 1e-15)
    }
    val r1 = byMethod("lsh_1x4").map(r => r._2 -> r._5).toMap
    val r8 = byMethod("lsh_8x4").map(r => r._2 -> r._5).toMap
    assert(r1.keySet === r8.keySet)
    r1.keySet.foreach(q => assert(r8(q) >= r1(q),
      s"query $q: 8-table recall ${r8(q)} < 1-table ${r1(q)}"))
  }

  test("ivf probe sweep: nprobe-4 recall dominates nprobe-2 per query (superset cells)") {
    val rows = graft.queries.LlmQueries.qAnnRecallIvf(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
    graft.operators.Caches.release()
    val byMethod = rows.groupBy(_._1)
    assert(byMethod.keySet === Set("ivf_p2", "ivf_p4"))
    rows.foreach { case (_, _, nTruth, nHit, recall) =>
      assert(nTruth === 10L)
      assert(math.abs(recall - nHit.toDouble / nTruth) < 1e-15)
    }
    val p2 = byMethod("ivf_p2").map(r => r._2 -> r._5).toMap
    val p4 = byMethod("ivf_p4").map(r => r._2 -> r._5).toMap
    assert(p2.keySet === p4.keySet)
    p2.keySet.foreach(q => assert(p4(q) >= p2(q),
      s"query $q: nprobe-4 recall ${p4(q)} < nprobe-2 ${p2(q)} — probed cells are a superset"))
  }
}
