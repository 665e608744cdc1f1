package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Join-key skew audit — the report that decides, BEFORE the big join,
  * whether a key needs salting ([[Scale.saltedJoin]]), AQE skew
  * splitting, or is safe to shuffle as-is. Per-key counts
  * are bucketed into powers of two and summarized per bucket; a key whose
  * top bucket holds a material share of the row mass is the skew signal
  * (one reducer receives that share under hash partitioning).
  *
  * Determinism contract: bucket = bit-length of the count
  * (`length(bin(cnt))` = ⌊log2 cnt⌋+1) — pure integer arithmetic, no
  * floating log. The share is ONE pinned double division per bucket.
  *
  * Scale shape: one map-side-combined count to |keys| slim rows, one
  * second reduction to ≤64 bucket rows, and an unpartitioned window over
  * those ≤64 rows for the total (bounded by the bit-length codomain, so
  * the single-partition window is constant work at any data size). Row
  * bodies never shuffle — only (key) then (bucket) pairs.
  */
object Skew {

  def skewReport(df: DataFrame, keyCol: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = df.groupBy(col(keyCol)).agg(count(lit(1)).as("cnt"))
    counts.groupBy(length(bin(col("cnt"))).as("bucket"))
      .agg(count(lit(1)).as("n_keys"), sum("cnt").as("n_rows"),
        max("cnt").as("max_key_rows"))
      .withColumn("rows_share",
        col("n_rows").cast("double") /
          sum("n_rows").over(Window.partitionBy()))
  }
}
