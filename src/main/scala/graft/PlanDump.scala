package graft

import java.nio.file.{Files, Paths}

/** Dev tool (r12 optimization round): dump `.explain("formatted")` for the
  * named queries into `plans/r12/<name>_<suffix>.txt` — the before/after
  * plan evidence the optimization log cites.
  * `runMain graft.PlanDump <name>[,<name>...] <suffix> [sfDir]`
  */
object PlanDump {
  def main(args: Array[String]): Unit = {
    val names = args(0).split(",").toSeq
    val suffix = args(1)
    val dir = if (args.length > 2) args(2) else "/root/testdata/sf0.1"
    val spark = GraftSession.tune(org.apache.spark.sql.SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    GraftSession.autoSizeShuffle(spark, dir)
    Files.createDirectories(Paths.get("plans/r12"))
    for (name <- names) {
      val fn = SparkEntry.queries(name)
      val plan = fn(spark, dir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      Files.writeString(Paths.get(s"plans/r12/${name}_$suffix.txt"), plan)
      println(s"[plandump] wrote plans/r12/${name}_$suffix.txt")
      graft.operators.Caches.release()
    }
    spark.stop()
  }
}
