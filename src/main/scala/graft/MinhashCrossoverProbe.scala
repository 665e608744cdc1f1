package graft

import graft.operators.{Caches, Dedup}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev tool behind the minhash broadcast↔banded crossover constant
  * (`Dedup.nearDupPairs(broadcastThreshold)`): times BOTH candidate
  * strategies on synthetic corpora of N distinct word sets and prints the
  * curve — `runMain graft.MinhashCrossoverProbe [sizes] [cpus] [runs]`.
  * Measurements recorded in PLANS.md.
  *
  * Corpus shape mirrors MinhashBandedSpec: N/2 base docs + N/2 single-word
  * variants (jaccard 14/16 = 0.875, all cross pairs far below 0.8), so
  * every size has exactly N/2 true pairs and the verify stage is identical
  * across strategies — the timing difference isolates the candidate stage.
  */
object MinhashCrossoverProbe {

  def corpus(spark: SparkSession, n: Int): DataFrame = {
    val half = n / 2
    def words(prefix: String) = concat_ws(" ",
      Seq(concat(lit(prefix), col("id").cast("string"))) ++
        (0 until 14).map(j => concat(lit("w"), (col("id") * 14 + lit(j)).cast("string"))): _*)
    spark.range(half).select(col("id"), words("u").as("text"))
      .unionByName(spark.range(half)
        .select((col("id") + half).as("id"), words("x").as("text")))
  }

  def main(args: Array[String]): Unit = {
    val sizes = (if (args.length > 0) args(0) else "2048,8192,32768,131072")
      .split(",").toSeq.map(_.trim.toInt)
    val cpus = if (args.length > 1) args(1) else "32"
    val runs = if (args.length > 2) args(2).toInt else 2
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def time(n: Int, broadcastThreshold: Long): Double = {
      val t0 = System.nanoTime()
      val docs = corpus(spark, n)
      val got = Dedup.nearDupPairs(docs, "id", "text", 0.8,
        broadcastThreshold = broadcastThreshold).count()
      Caches.release()
      require(got == n / 2, s"n=$n: expected ${n / 2} pairs, got $got")
      (System.nanoTime() - t0) / 1e9
    }
    // JIT warmup, both code paths
    time(512, Long.MaxValue); time(512, 0L)
    println(f"${"n_sets"}%8s ${"broadcast_s"}%12s ${"banded_s"}%10s")
    var broadcastDead = false
    for (n <- sizes) {
      val banded = (1 to runs).map(_ => time(n, 0L)).min
      val broadcast =
        if (broadcastDead) Double.NaN
        else {
          val t = (1 to runs).map(_ => time(n, Long.MaxValue)).min
          if (t > 120) broadcastDead = true // next size would be ~16× worse
          t
        }
      println(f"$n%8d $broadcast%12.3f $banded%10.3f")
    }
    spark.stop()
  }
}
