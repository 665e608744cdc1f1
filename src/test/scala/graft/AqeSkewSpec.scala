package graft

import org.apache.spark.sql.functions._

/** Evidence for the "residual skew is handled by AQE skew-join splitting"
  * claims (Dedup.scala): build a join where one key owns most of the fact
  * side, force the sort-merge path, lower the skew thresholds to
  * test-corpus scale, and assert the finalized adaptive plan actually split
  * the skewed partition — and that splitting never changes the result.
  */
class AqeSkewSpec extends SparkSpec {

  test("AQE splits the skewed partition of a sort-merge join") {
    withConf(
      "spark.sql.autoBroadcastJoinThreshold" -> "-1", // force sort-merge
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.0",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "16384",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "16384",
      "spark.sql.adaptive.coalescePartitions.minPartitionSize" -> "1024") {
      // 95% of the fact side lands on key 0; dim is uniform
      val fact = spark.range(200000).select(
        when(col("id") % 20 =!= 0, lit(0L)).otherwise(col("id") % 97).as("k"),
        col("id").as("v"))
      val dim = spark.range(97).select(col("id").as("k"),
        concat(lit("d"), col("id")).as("label"))
      val joined = fact.join(dim, "k").groupBy("label").agg(count(lit(1)).as("n"))
      val rows = joined.collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      // correctness is independent of the split: key 0 carries 19/20 of the
      // fact rows plus its own 1/97 share of the remainder
      assert(rows("d0") == 190000L + 200000L / 20 / 97 + 1)
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("isFinalPlan=true"), "adaptive plan did not finalize")
      assert(plan.contains("skew=true"),
        s"AQE did not split the skewed join partition:\n$plan")
    }
  }
}
