package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Scale evidence for the BPE family (`runMain graft.BpeScaleProbe`):
  * times TRAIN (corpus word-count aggregation + bounded driver merge loop),
  * VOCAB derivation, and the full token-ID ENCODE at sf0.1 vs the
  * deterministic ×10 corpus (graft.ScaleUp output), reporting ratios.
  *
  * What "scales" means here: train's corpus-sized work is ONE aggregation
  * (the merge loop runs on the bounded top-65536 word-frequency table, so
  * its cost is corpus-size-INDEPENDENT); encode is a pure per-row native
  * expression over a broadcast vocabulary — both should track data size
  * roughly linearly (ratio ≤ ~12× for 10× data, the same bound the other
  * family probes publish).
  */
object BpeScaleProbe {
  def main(args: Array[String]): Unit = {
    val dirs = Seq(
      "sf0.1" -> (if (args.length > 0) args(0) else "/root/testdata/sf0.1"),
      "sf1"   -> (if (args.length > 1) args(1) else "/root/repo/testdata-sf1"))
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    for ((tag, dir) <- dirs) {
      GraftSession.autoSizeShuffle(spark, dir)
      val docs = spark.read.parquet(s"$dir/documents.parquet")
      // min-of-3 per stage; train/vocab re-run in full each rep (no fixture
      // path involved — this probe measures the operators, not the memo)
      val trainT = (1 to 3).map(_ => timed(
        graft.operators.Bpe.train(docs, "text", numMerges = 48).count())._2).min
      val mergesDf = graft.operators.Bpe.train(docs, "text", numMerges = 48)
      val vocabT = (1 to 3).map(_ => timed(
        graft.operators.Bpe.vocab(docs, "text", mergesDf).count())._2).min
      val merges = graft.operators.Bpe.mergesOf(mergesDf)
      val vocab = graft.operators.Bpe.vocab(docs, "text", mergesDf).cache()
      vocab.count()
      val (rows, encodeT1) = timed(
        docs.select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .select(col("doc_id"), explode(graft.operators.Bpe.bpeTokens(col("w"), merges)).as("token"))
          .join(broadcast(vocab), Seq("token"), "left")
          .count())
      val encodeT = ((1 to 2).map(_ => timed(
        docs.select(col("doc_id"), explode(graft.functions.TextFunctions.tokens(col("text"))).as("w"))
          .filter(length(col("w")) > 0)
          .select(col("doc_id"), explode(graft.operators.Bpe.bpeTokens(col("w"), merges)).as("token"))
          .join(broadcast(vocab), Seq("token"), "left")
          .count())._2) :+ encodeT1).min
      vocab.unpersist()
      println(f"[bpescale] $tag train=$trainT%.2f s vocab=$vocabT%.2f s encode=$encodeT%.2f s tokens=$rows")
    }
    spark.stop()
  }
}
