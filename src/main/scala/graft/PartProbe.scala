package graft
import org.apache.spark.sql.SparkSession
/** A/B harness for the AQE initial-shuffle-width policy: banded minhash
  * under an explicit initialPartitionNum (`runMain graft.PartProbe 256
  * <dir>`) or the derived default (`runMain graft.PartProbe auto <dir>`,
  * = [[GraftSession.autoSizeShuffle]]). Produced the round-5 knob evidence
  * and the round-6 derived-default validation (PLANS.md).
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val init = args.headOption.getOrElse("32")
    val sf = if (args.length > 1) args(1) else "/root/repo/testdata-sf1"
    val runs = if (args.length > 2) args(2).toInt else 3
    val builder = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
    val spark = (if (init == "auto") builder
      else builder.config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init))
      .getOrCreate()
    if (init == "auto") {
      val w = GraftSession.autoSizeShuffle(spark, sf)
      println(s"[partprobe] auto width for $sf: $w")
    }
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to runs) {
      val t0 = System.nanoTime()
      val n = graft.queries.LlmQueries.qDedupMinhashBanded(spark, sf).count()
      graft.operators.Caches.release()
      println(f"[partprobe] init=$init run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
