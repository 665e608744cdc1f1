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
    * @param tokenCount how to count a document's tokens — defaults to the
    *                 whitespace count; pass [[Bpe.bpeLen]] to budget in
    *                 model tokens under a trained merge table
    */
  def tokenBudget(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
                  budgets: Map[String, Long], defaultBudget: Long,
                  prioBuckets: Int = 64, tokenCount: Option[Column] = None): DataFrame =
    withCumTokens(docs, idCol, textCol, stratumCol, prioBuckets, tokenCount)
      .filter(col("cum_tokens") <= budgetCol(stratumCol, budgets, defaultBudget))
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("cum_tokens"))

  /** EPOCH mixing — the up-sampling form: when a stratum's budget exceeds
    * its total token count, every document repeats for each full epoch
    * ("3.2 epochs of Wikipedia") and the fractional epoch is the same
    * hash-priority prefix [[tokenBudget]] draws. Output is one row per
    * (document, epoch); downstream packing shuffles epochs apart via its
    * (stratum, shard) keys. Deterministic and repartition-stable like the
    * budget draw; per-stratum totals are a tiny broadcast frame, so the
    * only data-sized work is the same two-level prefix sum plus one
    * bounded `sequence` explode (≤ ⌈budget/total⌉ rows per doc).
    */
  def epochMix(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
               budgets: Map[String, Long], defaultBudget: Long,
               prioBuckets: Int = 64): DataFrame = {
    val cum = withCumTokens(docs, idCol, textCol, stratumCol, prioBuckets)
    val totals = cum.groupBy(stratumCol).agg(sum("n_tokens").as("__tot"))
    val budget = budgetCol(stratumCol, budgets, defaultBudget)
    cum.join(broadcast(totals), stratumCol)
      .withColumn("__full", floor(budget / col("__tot")))
      .withColumn("__rem", budget % col("__tot"))
      // epochs 0..__full-1 for every doc, plus the priority-prefix partial
      .withColumn("__n", col("__full") + when(col("cum_tokens") <= col("__rem"), 1L).otherwise(0L))
      .filter(col("__n") > 0)
      .select(col(idCol), col(stratumCol), col("n_tokens"),
        explode(sequence(lit(0L), col("__n") - 1)).as("epoch"))
  }

  /** Temperature-weighted budgets: budget_s = totalBudget · √total_s / Σ√total —
    * the α = 0.5 point of the mT5/LLaMA-style temperature-sampling rule
    * (budget ∝ total^α), which up-weights small strata without letting any
    * stratum dominate. α is PINNED at 0.5 because sqrt is IEEE
    * exactly-rounded on every engine — an arbitrary pow() differs in last
    * ulps across libm implementations and would un-gate the draw. Weights
    * quantize to micro-units and the allocation is pure integer arithmetic
    * (BigInt — totalBudget · w overflows a long at 100 TB scale), so the
    * budget map is bit-identical on any engine; floor-division remainders
    * stay unallocated (≤ |strata| tokens).
    */
  def temperatureBudgets(totals: Seq[(String, Long)], totalBudget: Long): Map[String, Long] = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    val weights = totals.map { case (s, t) =>
      (s, BigInt(math.floor(math.sqrt(t.toDouble) * 1e6).toLong))
    }
    val sumW = weights.map(_._2).sum
    if (sumW == 0) totals.map { case (s, _) => (s, 0L) }.toMap
    else weights.map { case (s, w) => (s, ((BigInt(totalBudget) * w) / sumW).toLong) }.toMap
  }

  /** Temperature budgets at a RATIONAL α = p/q (published recipes use
    * α ∈ {0.2 … 0.7}, not just the 0.5 the √ path pins): budget_s ∝
    * total_s^(p/q), integer-exact. weight_s = ⌊10⁶ · total^(p/q)⌋ computed
    * as the integer q-th root of total^p · 10^(6q) — BigInt power and
    * Newton-iteration root ([[iroot]]), no libm call anywhere, so the
    * allocation is bit-identical on any engine at any α (the reason the √
    * path refused arbitrary pow(): last-ulp drift across libms). α = 1/2
    * agrees with [[temperatureBudgets]] to ≤ 1 micro-unit per weight (the
    * IEEE path rounds through doubles; this path is exact) and α = 1 (p=q)
    * degenerates to exactly-proportional allocation.
    */
  def temperatureBudgetsAlpha(totals: Seq[(String, Long)], totalBudget: Long,
                              alphaP: Int, alphaQ: Int): Map[String, Long] = {
    require(totalBudget >= 0, "totalBudget must be non-negative")
    require(alphaP >= 1 && alphaQ >= alphaP, s"need 0 < p/q <= 1, got $alphaP/$alphaQ")
    val mq = BigInt(10).pow(6 * alphaQ)
    val weights = totals.map { case (s, t) =>
      require(t >= 0, s"negative token total for stratum $s")
      (s, iroot(BigInt(t).pow(alphaP) * mq, alphaQ))
    }
    val sumW = weights.map(_._2).sum
    if (sumW == 0) totals.map { case (s, _) => (s, 0L) }.toMap
    else weights.map { case (s, w) => (s, ((BigInt(totalBudget) * w) / sumW).toLong) }.toMap
  }

  /** Integer n-th root: the unique r with r^n ≤ x < (r+1)^n. Newton
    * iteration on BigInt from an over-estimate (2^⌈bitLength/n⌉), which
    * descends monotonically; the final two guards pin the exact floor.
    */
  private[graft] def iroot(x: BigInt, n: Int): BigInt = {
    require(x >= 0 && n >= 1)
    if (x < 2 || n == 1) return x
    var r = BigInt(1) << (x.bitLength / n + 1)
    var descending = true
    while (descending) {
      val next = ((n - 1) * r + x / r.pow(n - 1)) / n
      if (next >= r) descending = false else r = next
    }
    while (r.pow(n) > x) r -= 1
    while ((r + 1).pow(n) <= x) r += 1
    r
  }

  /** [[tokenBudget]] with the per-stratum budgets DERIVED by
    * [[temperatureBudgets]] from the strata's own token totals — one extra
    * map-side-combined aggregation to |strata| rows, collected driver-side
    * (control-plane sized, the IVF-sample class of driver touch). Same
    * deterministic hash-priority draw downstream.
    */
  def temperatureMix(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
                     totalBudget: Long, prioBuckets: Int = 64,
                     tokenCount: Option[Column] = None): DataFrame = {
    val totals = stratumTotals(docs, stratumCol, textCol, tokenCount)
    tokenBudget(docs, idCol, textCol, stratumCol,
      temperatureBudgets(totals, totalBudget), defaultBudget = 0L, prioBuckets, tokenCount)
  }

  /** [[temperatureMix]] at a rational α = p/q ([[temperatureBudgetsAlpha]]);
    * same derivation aggregation and deterministic draw.
    */
  def temperatureMixAlpha(docs: DataFrame, idCol: String, textCol: String, stratumCol: String,
                          totalBudget: Long, alphaP: Int, alphaQ: Int,
                          prioBuckets: Int = 64,
                          tokenCount: Option[Column] = None): DataFrame = {
    val totals = stratumTotals(docs, stratumCol, textCol, tokenCount)
    tokenBudget(docs, idCol, textCol, stratumCol,
      temperatureBudgetsAlpha(totals, totalBudget, alphaP, alphaQ),
      defaultBudget = 0L, prioBuckets, tokenCount)
  }

  /** Per-stratum token totals, collected driver-side (|strata| rows —
    * control plane). NULL strata are excluded from the derivation (they'd
    * NPE the sort and a budget can't be keyed on null) — their docs fall to
    * defaultBudget=0 downstream, i.e. never drawn; a stratum whose token
    * counts are all NULL sums to 0 via the coalesce rather than crashing
    * the driver read.
    */
  private def stratumTotals(docs: DataFrame, stratumCol: String, textCol: String,
                            tokenCount: Option[Column]): Seq[(String, Long)] = docs
    .select(col(stratumCol).cast("string").as("__s"),
      tokenCount.getOrElse(TextFunctions.tokenCountWs(col(textCol))).cast("long").as("__n"))
    .filter(col("__s").isNotNull)
    .groupBy("__s").agg(coalesce(sum("__n"), lit(0L)).as("__tot"))
    .collect().map(r => (r.getString(0), r.getLong(1))).toSeq.sortBy(_._1)

  /** Token-budget SHARD assignment — the corpus-output layout step: order
    * the corpus by the deterministic (bucket, priority, id) total order and
    * cut it into shards of `shardTokens` tokens by START offset (a document
    * straddling a boundary belongs to the shard its first token lands in,
    * so shard token sums are ≤ shardTokens + one document). This is the
    * WebDataset/Megatron-style "shard files of ~N tokens" writer input.
    *
    * Same two-level distributed prefix sum as [[tokenBudget]] — one global
    * stream, never one global window: bucket totals aggregate map-side,
    * offsets broadcast, within-bucket windows are `prioBuckets`-way
    * parallel. Document bodies never shuffle (join them back by id at
    * write time — [[writeShards]]).
    */
  /** @param startOffset token position the stream starts at — 0 for a
    *        whole-corpus batch run; a streaming micro-batch passes the
    *        previous batch's end offset so shard boundaries continue
    *        across batches ([[graft.streaming.StreamShards]])
    */
  def shardAssign(docs: DataFrame, idCol: String, textCol: String, shardTokens: Long,
                  prioBuckets: Int = 64, startOffset: Long = 0L): DataFrame = {
    require(shardTokens > 0, "shardTokens must be positive")
    require(startOffset >= 0, "startOffset must be non-negative")
    require(!docs.columns.contains("__all"), "reserved column name __all")
    val cum = withCumTokens(docs.withColumn("__all", lit("all")), idCol, textCol,
      "__all", prioBuckets)
    cum
      .withColumn("cum_tokens", col("cum_tokens") + lit(startOffset))
      .withColumn("shard_id", expr(s"(cum_tokens - n_tokens) div $shardTokens"))
      .select(col(idCol), col("n_tokens"), col("cum_tokens"), col("shard_id"))
  }

  /** Materialize [[shardAssign]]: one parquet partition directory per
    * shard. `repartition(shard_id)` co-locates each shard's rows into one
    * task, so every shard writes as one file whose size tracks the token
    * budget — the layout a data-loader fleet reads.
    */
  def writeShards(docs: DataFrame, assigned: DataFrame, idCol: String, outDir: String): Unit =
    docs.join(assigned.select(col(idCol), col("shard_id")), idCol)
      .repartition(col("shard_id"))
      .write.mode("overwrite").partitionBy("shard_id").parquet(outDir)

  private def budgetCol(stratumCol: String, budgets: Map[String, Long],
                        defaultBudget: Long): Column =
    budgets.foldLeft(lit(defaultBudget)) { case (acc, (s, b)) =>
      when(col(stratumCol) === s, b).otherwise(acc)
    }

  /** (id, stratum, n_tokens, cum_tokens) with cum_tokens the running total
    * over the (bucket, priority, id) total order within each stratum — the
    * two-level prefix sum described above.
    */
  private def withCumTokens(docs: DataFrame, idCol: String, textCol: String,
                            stratumCol: String, prioBuckets: Int,
                            tokenCount: Option[Column] = None): DataFrame = {
    val base = docs.select(
      col(idCol),
      col(stratumCol),
      tokenCount.getOrElse(TextFunctions.tokenCountWs(col(textCol)))
        .cast("long").as("n_tokens"),
      Sampling.md5Bucket(col(idCol), 1000000).as("__prio"))
      .withColumn("__bucket", pmod(col("__prio"), lit(prioBuckets)))
    val totals = base.groupBy(stratumCol, "__bucket").agg(sum("n_tokens").as("__btok"))
    val wBuckets = Window.partitionBy(stratumCol).orderBy("__bucket")
    val offsets = totals
      .withColumn("__off", sum("__btok").over(wBuckets) - col("__btok"))
      .select(col(stratumCol), col("__bucket"), col("__off"))
    val wInBucket = Window.partitionBy(stratumCol, "__bucket").orderBy("__prio", idCol)
    base.join(broadcast(offsets), Seq(stratumCol, "__bucket"))
      .withColumn("cum_tokens", col("__off") + sum("n_tokens").over(wInBucket))
      .select(col(idCol), col(stratumCol), col("n_tokens"), col("cum_tokens"))
  }
}
