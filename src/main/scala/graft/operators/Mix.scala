package graft.operators

import graft.functions.{Sampling, TextFunctions}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus MIXING: assemble a training mix by drawing a deterministic token
  * budget from each stratum (source/domain/language) — "2B tokens of web,
  * 500M of code" — the step between curation and sequence packing.
  *
  * Selection is by hash priority: every document gets an md5-derived
  * priority, and each stratum keeps its lowest-priority documents until the
  * budget fills. The choice is engine-independent, repartition-stable, and
  * incremental (re-running with a larger budget only ADDS documents — the
  * priority order never changes), unlike an RNG sample.
  *
  * Scale: the running token sum is a two-level distributed prefix sum, not
  * one window per stratum (a per-stratum window is a single partition — at
  * 100 TB a "web" stratum would serialize through one task):
  *  1. per-(stratum, bucket) token totals — one map-side-combined
  *     aggregation of slim (stratum, bucket, tokens) rows; `prioBuckets`
  *     buckets per stratum, so the frame is |strata|×B rows;
  *  2. bucket offsets — a window over that TINY frame (broadcast back);
  *  3. within-bucket running sums — window partitions are (stratum ×
  *     bucket): B× more parallel than per-stratum, each holding ~1/B of a
  *     stratum's rows. Raise `prioBuckets` with corpus size.
  * Document text never shuffles — only (id, stratum, n_tokens, priority)
  * rows move; bodies stay where selection joins back by id if needed.
  */
object Mix {

  /** Documents surviving per-stratum token budgets, with their running
    * token position (`cum_tokens` ≤ budget, computed over the total order
    * (bucket, priority, id) within each stratum).
    *
    * @param budgets  token budget per stratum value; `defaultBudget` for
    *                 strata not listed
    */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
                  budgets: Map[String, Long], defaultBudget: Long,
                  prioBuckets: Int = 64): DataFrame = {
    val base = docs.select(
      col(idCol),
      col(stratumCol),
      TextFunctions.tokenCountWs(col(textCol)).cast("long").as("n_tokens"),
      Sampling.md5Bucket(col(idCol), 1000000).as("__prio"))
      .withColumn("__bucket", pmod(col("__prio"), lit(prioBuckets)))
    val totals = base.groupBy(stratumCol, "__bucket").agg(sum("n_tokens").as("__btok"))
    val wBuckets = Window.partitionBy(stratumCol).orderBy("__bucket")
    val offsets = totals
      .withColumn("__off", sum("__btok").over(wBuckets) - col("__btok"))
      .select(col(stratumCol), col("__bucket"), col("__off"))
    val wInBucket = Window.partitionBy(stratumCol, "__bucket").orderBy("__prio", idCol)
    val budget: Column = budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, b).otherwise(acc)
    }
    base.join(broadcast(offsets), Seq(stratumCol, "__bucket"))
      .withColumn("cum_tokens", col("__off") + sum("n_tokens").over(wInBucket))
      .filter(col("cum_tokens") <= budget)
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("cum_tokens"))
  }
}
