package graft

import graft.operators.Caches
import graft.queries.{AnalyticsQueries, LlmQueries}
import org.apache.spark.sql.functions._

/** Threshold-sensitivity curve and the 80/20 concentration report:
  * cross-query consistency and closed-form rank identities.
  */
class SweepParetoSpec extends SparkSpec {
  import spark.implicits._

  test("sweep is monotone decreasing and its 0.8 point equals q_dedup_minhash") {
    val curve = LlmQueries.qDedupSweep(spark, sfDir).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    Caches.release()
    assert(curve(0.7) >= curve(0.8) && curve(0.8) >= curve(0.9))
    val at08 = LlmQueries.qDedupMinhash(spark, sfDir).count()
    Caches.release()
    assert(curve(0.8) == at08,
      s"sweep 0.8 point ${curve(0.8)} != minhash route $at08")
  }

  test("keep sweep: monotone increasing in threshold, 0.8 point equals the near-keep materializer") {
    val curve = LlmQueries.qKeepSweep(spark, sfDir).collect()
      .map(r => r.getDouble(0) -> r.getLong(1)).toMap
    Caches.release()
    // higher threshold deletes less → more survivors
    assert(curve(0.7) <= curve(0.8) && curve(0.8) <= curve(0.9))
    val kept08 = LlmQueries.qDedupNearKeep(spark, sfDir).count()
    Caches.release()
    assert(curve(0.8) == kept08,
      s"keep-sweep 0.8 point ${curve(0.8)} != near-keep materializer $kept08")
    val nDocs = spark.read.parquet(s"$sfDir/documents.parquet").count()
    assert(curve(0.9) <= nDocs)
  }

  test("pareto report: rank identity on a closed-form ladder") {
    // revenues 100, 50, 30, 10, 10 (total 200): 50% needs 1 (100 ≥ 100),
    // 80% needs 3 (180 ≥ 160), 90% also 3 (180 hits 180 EXACTLY — the
    // boundary case the strict-< rank identity must get right)
    val rev = Seq((1L, 100L), (2L, 50L), (3L, 30L), (4L, 10L), (5L, 10L))
      .toDF("o_custkey", "rev").withColumn("negrev", -col("rev"))
    val cum = graft.operators.Scale.runningSum(rev, Seq("negrev", "o_custkey"), "rev", "cum")
    val tot = 200L
    def k(pct: Int): Long =
      cum.filter(col("cum") * 100 < lit(pct.toLong) * tot).count() + 1
    val got = Seq(50, 80, 90).map(p => p -> k(p)).toMap
    Caches.release()
    assert(got == Map(50 -> 1L, 80 -> 3L, 90 -> 3L))
  }

  test("pareto on the real table: n_customers monotone in pct, shares in (0,1]") {
    val rows = AnalyticsQueries.qParetoShare(spark, sfDir).collect()
    Caches.release()
    val byPct = rows.map(r => r.getInt(0) -> (r.getLong(1), r.getDouble(2))).toMap
    assert(byPct(50)._1 <= byPct(80)._1 && byPct(80)._1 <= byPct(90)._1)
    assert(rows.forall(r => r.getDouble(2) > 0 && r.getDouble(2) <= 1.0))
  }
}
