package graft.operators

import graft.functions.Sampling
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Small-file compaction planner — the lakehouse maintenance operator
  * (Delta OPTIMIZE / Iceberg rewrite_data_files shape): pack an ingest's
  * many small files into target-size output bins, deterministically.
  *
  * A 100 TB corpus ingested by thousands of tasks accumulates millions
  * of KB-sized files; every future scan then pays per-file open cost and
  * the driver pays per-file planning cost. The planner works on the FILE
  * LISTING, not the data — metadata-sized input (one row per file), so
  * the whole plan is control-plane cheap no matter how big the table is.
  * Packing is prefix-sum binning: within a partition (source), files in
  * listing order go to bin = floor(bytes-before-this-file / target) —
  * ONE window pass, no driver loop, reproducible on any cluster size.
  * (First-fit-decreasing packs ~11% tighter but needs a sort by size
  * AND loses streaming determinism; prefix-sum is what OPTIMIZE does.)
  */
object Compaction {

  /** Deterministic pseudo-file listing for the documents corpus: docs
    * hash-bucketed into `buckets` files per source ([[Sampling.md5Bucket]]
    * contract), sized by the char count — the synthetic stand-in for a
    * real parquet listing (sandbox tables arrive as one file each).
    */
  def pseudoFiles(docs: DataFrame, sourceCol: String, idCol: String,
                  sizeCol: String, buckets: Int): DataFrame =
    docs.groupBy(col(sourceCol).as("source"),
        Sampling.md5Bucket(col(idCol), buckets).as("file_id"))
      .agg(count(lit(1)).as("n_docs"), sum(col(sizeCol)).as("bytes"))

  /** The plan: one row per (source, bin) with file range, doc/byte
    * totals, and the fill ratio vs target. Input is a file listing
    * (source, file_id, n_docs, bytes); `file_id` order stands in for
    * listing order (creation time on a real table).
    */
  def plan(files: DataFrame, targetBytes: Long): DataFrame = {
    val w = Window.partitionBy("source").orderBy("file_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    files
      .withColumn("cum_before", coalesce(sum("bytes").over(w), lit(0L)))
      .withColumn("bin_id", expr(s"CAST(cum_before DIV ${targetBytes}L AS BIGINT)"))
      .groupBy("source", "bin_id")
      .agg(count(lit(1)).as("n_files"), sum("n_docs").as("n_docs"),
           sum("bytes").as("bytes"),
           min("file_id").as("file_lo"), max("file_id").as("file_hi"))
      .withColumn("fill", col("bytes").cast("double") / lit(targetBytes.toDouble))
  }
}
