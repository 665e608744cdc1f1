package graft
import org.apache.spark.sql.SparkSession
/** One-off experiment: banded minhash at sf1 under different AQE
  * initialPartitionNum settings (see PLANS.md round-5 shuffle-partition
  * note). Deleted after measurement if it stops being useful.
  */
object PartProbe {
  def main(args: Array[String]): Unit = {
    val init = args.headOption.getOrElse("32")
    val sf = if (args.length > 1) args(1) else "/root/repo/testdata-sf1"
    val spark = GraftSession.tune(SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", init)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    for (i <- 1 to 3) {
      val t0 = System.nanoTime()
      val n = graft.queries.LlmQueries.qDedupMinhashBanded(spark, sf).count()
      graft.operators.Caches.release()
      println(f"[partprobe] init=$init run$i: ${(System.nanoTime()-t0)/1e9}%.2f s rows=$n")
    }
    spark.stop()
  }
}
