package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stable dictionary encoding for categorical columns — the feature-store
  * primitive every training pipeline needs before a categorical column
  * feeds a model: map each distinct value to a DENSE integer code,
  * frequency-descending (code 0 = most common) with a lexicographic tie
  * break, so the assignment is a pure function of the value distribution
  * (partitioning-, run-, and engine-invariant — no `StringIndexer`-style
  * first-seen nondeterminism).
  *
  * Scale shape: ONE map-side-combined count agg over the corpus collapses
  * to the |vocabulary|-sized (value, n) frame; the rank window runs on
  * that control-plane-sized frame, never the corpus. Encoding a fact
  * table is then one broadcast join against the dictionary.
  */
object Dict {

  /** The dictionary: (value, n, code) — code is dense from 0, most
    * frequent first, ties broken by value ascending.
    */
  def build(rows: DataFrame, valueCol: String): DataFrame = {
    val counts = rows.groupBy(col(valueCol).cast("string").as("value"))
      .agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("value"))
    // the global window is sound HERE: it orders the vocabulary frame
    // (post-aggregation), which is bounded by distinct-value count, not
    // corpus size
    counts.withColumn("code", (row_number().over(w) - lit(1)).cast("long"))
  }

  /** Encode `rows`' `valueCol` through the dictionary: the input columns
    * plus a `code` column (null for out-of-vocabulary values, so a stale
    * dictionary FAILS VISIBLY instead of mis-coding).
    */
  def encode(rows: DataFrame, dict: DataFrame, valueCol: String): DataFrame =
    rows.join(broadcast(dict.select(col("value"), col("code"))),
        rows(valueCol).cast("string") === col("value"), "left")
      .drop("value")
}
