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
  * NULL contract: nulls are NOT vocabulary (build filters them out), so a
  * null input always encodes as a null code — same visible signal as
  * out-of-vocabulary. Before r11 a null could sneak INTO the dictionary
  * (groupBy keeps the null group) yet never match encode's equi-join, an
  * indistinguishable-from-OOV dead code; and a null in the rank window
  * orders NULLS FIRST in Spark but NULLS LAST in DuckDB, so tie codes
  * could drift cross-engine. Filtering at build closes both.
  *
  * Scale shape: ONE map-side-combined count agg over the corpus collapses
  * to the |vocabulary|-sized (value, n) frame. For a true categorical
  * vocabulary (the intended use) the rank runs as a single global window
  * and encode broadcasts the dictionary. For a HIGH-CARDINALITY column
  * (URLs, user ids — vocabulary ~ corpus scale) pass `bigVocab = true`:
  * the rank becomes the two-level [[Scale.globalRowNumber]] posture (no
  * single-task window) and encode uses a plain shuffle join (no
  * broadcast OOM). Both routes assign IDENTICAL codes — (n desc, value)
  * is a total order on the distinct-value frame, so the two-level
  * numbering has no ties to break arbitrarily (DictSpec proves equality
  * on a planted frame).
  */
object Dict {

  /** The dictionary: (value, n, code) — code is dense from 0, most
    * frequent first, ties broken by value ascending. Null values are
    * excluded (see the NULL contract above).
    */
  def build(rows: DataFrame, valueCol: String, bigVocab: Boolean = false): DataFrame = {
    val counts = rows.select(col(valueCol).cast("string").as("value"))
      .filter(col("value").isNotNull)
      .groupBy("value")
      .agg(count(lit(1)).as("n"))
    if (bigVocab) {
      // two-level global numbering: order by (−n, value) ascending ≡
      // (n desc, value asc); value is distinct post-agg so the order is
      // total — no arbitrary tie placement across partitions
      Scale.globalRowNumber(
          counts.withColumn("__neg_n", -col("n")),
          orderCols = Seq("__neg_n", "value"), out = "__rn")
        .select(col("value"), col("n"), (col("__rn") - lit(1L)).cast("long").as("code"))
    } else {
      val w = org.apache.spark.sql.expressions.Window
        .orderBy(col("n").desc, col("value"))
      // the global window is sound HERE: it orders the vocabulary frame
      // (post-aggregation), which is bounded by distinct-value count, not
      // corpus size — that bound is exactly what bigVocab=true is for
      counts.withColumn("code", (row_number().over(w) - lit(1)).cast("long"))
    }
  }

  /** Encode `rows`' `valueCol` through the dictionary: the input columns
    * plus a `code` column (null for out-of-vocabulary AND null values, so
    * a stale dictionary FAILS VISIBLY instead of mis-coding). Broadcasts
    * the dictionary only when `broadcastDict` (default) — a
    * `bigVocab`-built corpus-scale dictionary must pass false and take
    * the shuffle join.
    */
  def encode(rows: DataFrame, dict: DataFrame, valueCol: String,
             broadcastDict: Boolean = true): DataFrame = {
    val d0 = dict.select(col("value"), col("code"))
    val d = if (broadcastDict) broadcast(d0) else d0
    rows.join(d, rows(valueCol).cast("string") === col("value"), "left")
      .drop("value")
  }
}
