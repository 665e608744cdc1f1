package graft
import org.apache.spark.sql.SparkSession

/** Debug helper: dump ONE registered query's result to parquet
  * (`runMain graft.DumpQuery <name> <sfDir> <outPath>`), for diffing a
  * single query against its DuckDB oracle without a full Verify pass.
  */
object DumpQuery {
  def main(args: Array[String]): Unit = {
    val Array(name, sfDir, outPath) = args
    val spark = GraftSession.tune(SparkSession.builder()
        .master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false"))
      .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "8")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.queries(name)(spark, sfDir)
      .coalesce(1).write.mode("overwrite").parquet(outPath)
    SparkEntry.oracleSql.get(name).foreach(sql =>
      java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$outPath.oracle.sql"), sql))
    spark.stop()
  }
}
