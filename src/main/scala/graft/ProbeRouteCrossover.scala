package graft

import graft.operators.{Caches, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool behind the probe route planner's `nestedLoopWorkBudget`
  * (`Dedup.probeSurvivors`, r9): times BOTH probe routes over a
  * |index| × |batch| grid and prints the crossover surface —
  * `runMain graft.ProbeRouteCrossover [indexSizes] [batchSizes] [cpus]
  * [runs]`. Measurements recorded in PLANS.md.
  *
  * Setup mirrors the production ingest shape the bench's q_dedup_probe
  * times: the index is built once per size with [[Dedup.buildNearDupIndex]]
  * and MATERIALIZED TO PARQUET, so the nested route pays its real
  * repartition+persist cost and |index| counts from footer metadata.
  * Corpus shape mirrors MinhashCrossoverProbe (16-word docs); the batch is
  * half near-dup variants of indexed docs (jaccard 14/16 = 0.875 ≥ 0.8 —
  * rejected) and half fresh docs (survivors), so both routes exercise
  * candidate generation AND verify, and the survivor count cross-checks
  * route equality at every grid point.
  */
object ProbeRouteCrossover {

  private def words(prefix: String, idc: org.apache.spark.sql.Column) = concat_ws(" ",
    Seq(concat(lit(prefix), idc.cast("string"))) ++
      (0 until 15).map(j => concat(lit("w"), (idc * 15 + lit(j)).cast("string"))): _*)

  /** n index docs, all distinct word sets. */
  def indexCorpus(spark: SparkSession, n: Long): DataFrame =
    spark.range(n).select(col("id"), words("u", col("id")).as("text"))

  /** m batch docs: even ids add one word to index doc id/2's 16-word set
    * (jaccard 16/17 ≈ 0.94 ≥ 0.8 → rejected); odd ids are fresh (survive).
    */
  def batchCorpus(spark: SparkSession, m: Long): DataFrame =
    spark.range(m).select(col("id"),
      when(col("id") % 2 === 0,
        concat(lit("v"), col("id").cast("string"), lit(" "),
          words("u", col("id") / 2)))
        .otherwise(words("f", col("id"))).as("text"))

  def main(args: Array[String]): Unit = {
    val idxSizes = (if (args.length > 0) args(0) else "8192,65536,262144")
      .split(",").toSeq.map(_.trim.toLong)
    val batchSizes = (if (args.length > 1) args(1) else "64,1024,8192")
      .split(",").toSeq.map(_.trim.toLong)
    val cpus = if (args.length > 2) args(2) else "32"
    val runs = if (args.length > 3) args(3).toInt else 2
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(index: DataFrame, m: Long, budget: Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val got = Dedup.probeSurvivors(index, batchCorpus(spark, m), "id", "text",
        threshold = 0.8, nestedLoopWorkBudget = budget).count()
      Caches.release()
      ((System.nanoTime() - t0) / 1e9, got)
    }

    // warmup both code paths
    val wIdx = indexCorpus(spark, 512)
    val wPath = java.nio.file.Files.createTempDirectory("probe_idx_w").toString
    Dedup.buildNearDupIndex(wIdx, "id", "text").write.mode("overwrite").parquet(wPath)
    val wFrame = spark.read.parquet(wPath)
    time(wFrame, 64, Long.MaxValue); time(wFrame, 64, 0L)

    println(f"${"n_index"}%9s ${"n_batch"}%8s ${"nested_s"}%9s ${"banded_s"}%9s  route_work")
    for (nIdx <- idxSizes) {
      val path = java.nio.file.Files.createTempDirectory(s"probe_idx_$nIdx").toString
      Dedup.buildNearDupIndex(indexCorpus(spark, nIdx), "id", "text")
        .write.mode("overwrite").parquet(path)
      val index = spark.read.parquet(path)
      for (m <- batchSizes) {
        val work = nIdx * m
        // past ~2e10 cell evaluations the nested loop is minutes — skip
        val nested =
          if (work > 20_000_000_000L) (Double.NaN, -1L)
          else (1 to runs).map(_ => time(index, m, Long.MaxValue)).minBy(_._1)
        val banded = (1 to runs).map(_ => time(index, m, 0L)).minBy(_._1)
        require(nested._2 < 0 || nested._2 == banded._2,
          s"route mismatch at ($nIdx, $m): ${nested._2} vs ${banded._2}")
        println(f"$nIdx%9d $m%8d ${nested._1}%9.2f ${banded._1}%9.2f  ${work}%d")
      }
    }
    spark.stop()
  }
}
