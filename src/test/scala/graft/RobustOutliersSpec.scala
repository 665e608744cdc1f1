package graft

import graft.operators.Curation
import org.apache.spark.sql.functions._

/** Hampel median/MAD outlier gate (`Curation.robustOutliers`): reference
  * model, breakdown robustness vs the mean/stddev rule, and the MAD = 0
  * edge.
  */
class RobustOutliersSpec extends SparkSpec {
  import spark.implicits._

  private def run(rows: Seq[(Long, String, Long)], k: Int = 3)
      : Map[Long, (Long, Long, Long, Boolean)] = {
    val out = Curation.robustOutliers(rows.toDF("id", "grp", "v"), "id", "grp", "v", k)
      .collect().map(r => r.getLong(0) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getBoolean(5))).toMap
    graft.operators.Caches.release()
    out
  }

  /** Discrete median: smallest value with cumulative count ≥ ⌈n/2⌉. */
  private def med(vs: Seq[Long]): Long = {
    val s = vs.sorted
    s(math.ceil(s.size * 0.5).toInt - 1)
  }

  private def ref(rows: Seq[(Long, String, Long)], k: Int = 3)
      : Map[Long, (Long, Long, Long, Boolean)] =
    rows.groupBy(_._2).flatMap { case (_, g) =>
      val m = med(g.map(_._3))
      val mad = med(g.map(r => math.abs(r._3 - m)))
      g.map(r => r._1 -> (r._3, m, mad, math.abs(r._3 - m) > k * mad))
    }.toMap

  test("operator matches the reference model across groups") {
    val rows = Seq[(Long, String, Long)](
      (1L, "a", 10), (2L, "a", 12), (3L, "a", 11), (4L, "a", 13), (5L, "a", 500),
      (6L, "b", 100), (7L, "b", 101), (8L, "b", 99), (9L, "b", 98), (10L, "b", 102))
    val got = run(rows)
    assert(got === ref(rows))
    assert(got(5L)._4, "the planted spike must be flagged")
    assert(got.filter(_._1 != 5L).values.forall(!_._4), "nothing else flagged")
  }

  test("50% breakdown: a garbage cluster cannot drag the gate (mean/stddev would move)") {
    // 6 normal values + 4 extreme ones: median/MAD stay anchored on the
    // normal mass, so all four extremes flag; a mean±3σ gate inflated by
    // the same extremes flags NONE of them (σ grows with the outliers)
    val vs = Seq[Long](10, 11, 12, 12, 13, 14, 9000, 9100, 9200, 9300)
    val rows = vs.zipWithIndex.map { case (v, i) => (i.toLong, "g", v) }
    val got = run(rows)
    assert(got === ref(rows))
    assert(vs.count(_ > 1000) === got.values.count(_._4))
    val mean = vs.sum.toDouble / vs.size
    val sd = math.sqrt(vs.map(v => (v - mean) * (v - mean)).sum / vs.size)
    assert(vs.forall(v => math.abs(v - mean) <= 3 * sd),
      "fixture sanity: the classic gate is blind here")
  }

  test("MAD = 0 flags every value off the median (the documented Hampel edge)") {
    val rows = Seq[(Long, String, Long)](
      (1L, "g", 7), (2L, "g", 7), (3L, "g", 7), (4L, "g", 7), (5L, "g", 8))
    val got = run(rows)
    assert(got === ref(rows))
    assert(got(5L)._4 && !got(1L)._4)
  }
}
