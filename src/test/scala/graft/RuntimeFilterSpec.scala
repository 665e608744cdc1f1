package graft

import org.apache.spark.sql.functions._

/** Runtime row-level filtering: when one side of a shuffle join carries a
  * selective predicate, Catalyst can inject a bloom-filter semi-join that
  * prunes the probe side's scan BEFORE the shuffle — at 100 TB this is the
  * difference between shuffling the whole fact table and shuffling only
  * rows that can possibly match. The engine relies on this being ON
  * (GraftSession enables AQE; the bloom rewrite is Catalyst's); this spec
  * pins that the injection actually happens for the canonical
  * filtered-dim ⋈ fact shape, and that the filtered result is identical.
  */
class RuntimeFilterSpec extends SparkSpec {

  test("a selective dim filter injects a bloom might_contain on the fact scan") {
    withConf(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      // test-corpus scale: let any creation side qualify, any scan apply
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "1GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1") {
      val li = GraftSession.table(spark, sfDir, "lineitem")
        .select("l_orderkey", "l_quantity")
      val ord = GraftSession.table(spark, sfDir, "orders")
        .filter(col("o_totalprice") > 300000)
        .select("o_orderkey", "o_totalprice")
      val j = li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      val plan = j.queryExecution.optimizedPlan.toString
      assert(plan.contains("might_contain"),
        s"runtime bloom filter was not injected:\n$plan")
      // injection is a pure optimization: result identical with it disabled
      val got = j.groupBy().agg(count(lit(1)), sum("l_quantity")).collect().toSeq
      val want = withConf("spark.sql.optimizer.runtime.bloomFilter.enabled" -> "false") {
        j.groupBy().agg(count(lit(1)), sum("l_quantity")).collect().toSeq
      }
      assert(got == want)
    }
  }
}
