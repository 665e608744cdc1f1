package graft

import org.apache.spark.sql.functions._

/** Exhaustive boundary audit of the early-exit jaccard expressions: every
  * pair of subsets of a 6-element universe (64×64 = 4,096 pairs, sizes 0–6,
  * jaccards hitting every small rational) × thresholds sitting ON those
  * rationals (⅓, ½, ⅔, ¾, exact 0 and 1) — the exact regime where the
  * integer n_req fix-up must reproduce the double predicate bit-for-bit.
  * The reference verdict is computed driver-side with the same arithmetic
  * as the original Column filter.
  */
class JaccardThresholdSpec extends SparkSpec {
  import spark.implicits._

  private val universe = Vector("a", "b", "c", "d", "e", "f")
  private def subset(mask: Int): Seq[String] =
    universe.indices.filter(i => (mask & (1 << i)) != 0).map(universe)

  test("all 4096 subset pairs match the exact predicate at boundary thresholds") {
    val pairs = for (ma <- 0 until 64; mb <- 0 until 64)
      yield (ma, mb, subset(ma), subset(mb))
    val df = pairs.toDF("ma", "mb", "x", "y")
    for (t <- Seq(0.0, 1.0 / 3, 0.5, 2.0 / 3, 0.75, 0.8, 1.0)) {
      val got = df.select(col("ma"), col("mb"),
          graft.plans.NativeHash.jaccardGe(col("x"), col("y"), t).as("ge"),
          graft.plans.NativeHash.sortedIntersectGe(col("x"), col("y"), t).as("n"))
        .collect()
      got.foreach { r =>
        val (ma, mb) = (r.getInt(0), r.getInt(1))
        val inter = Integer.bitCount(ma & mb)
        val union = Integer.bitCount(ma | mb)
        // the original filter's arithmetic: int casts to double, then >=
        val want = inter.toDouble / union.toDouble >= t // 0/0 = NaN -> false
        assert(r.getBoolean(2) == want, s"jaccardGe ma=$ma mb=$mb t=$t")
        assert(r.getInt(3) == (if (want) inter else -1),
          s"sortedIntersectGe ma=$ma mb=$mb t=$t got ${r.getInt(3)}")
      }
    }
  }
}
