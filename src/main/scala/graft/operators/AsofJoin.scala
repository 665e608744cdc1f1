package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the single right row with the greatest
  * `rightTime <= leftTime` within the same key — the canonical time-series
  * enrichment operator (DuckDB/kdb `ASOF JOIN`), which Spark has no native
  * plan for.
  *
  * Implementation is the union trick, NOT a range cross-join: tag both
  * sides, union, and carry the latest right payload forward with
  * `last(_, ignoreNulls)` over a (key, time)-ordered window. The payload
  * travels as ONE struct so all its columns always come from the same
  * matched right row (independent per-column carry would mix rows when
  * payload fields are null). Cost is one shuffle on the key + a per-key
  * sort — O((|L|+|R|)·log) instead of the O(|L|·|R|) band join a naive
  * `BETWEEN`+window formulation plans. At 100 TB the window state is one
  * payload per key.
  *
  * Determinism: right rows must be unique per (key, time) — pre-dedupe
  * with [[KeyedMergeSet]]/arg_max, as the query layer does — otherwise
  * "the" match at a timestamp is undefined in any engine.
  */
object AsofJoin {

  /** @param rightCols right payload columns to graft onto left rows */
  def join(left: DataFrame, right: DataFrame, key: String, leftTime: String,
           rightTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    val taggedLeft = left.select(
      col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__is_left") +:
        lit(null).cast(right.select(payload).schema.head.dataType).as("__payload") +:
        leftCols.map(col): _*)
    val taggedRight = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__is_left"), payload.as("__payload"))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // right rows sort BEFORE left rows at equal time ⇒ "<=" semantics
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__is_left"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = unioned.withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))

    filled.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }

  /** FORWARD as-of join: for each left row, the single right row with the
    * SMALLEST `rightTime >= leftTime` within the same key — the next-event
    * lookup (next shipment after an order, next purchase after an error).
    * The mirror of [[join]]: same union trick, same one-shuffle cost, but
    * the payload is carried BACKWARD with `first(_, ignoreNulls)` over the
    * current-row-to-end window; left rows sort before right rows at equal
    * time, so an exactly-simultaneous right row matches (">=" semantics).
    */
  def joinForward(left: DataFrame, right: DataFrame, key: String, leftTime: String,
                  rightTime: String, rightCols: Seq[String]): DataFrame = {
    val leftCols = left.columns.toSeq
    val payload = struct(rightCols.map(col): _*)

    val taggedLeft = left.select(
      col(key).as("__k") +: col(leftTime).as("__t") +: lit(1).as("__is_left") +:
        lit(null).cast(right.select(payload).schema.head.dataType).as("__payload") +:
        leftCols.map(col): _*)
    val taggedRight = right.select(
      col(key).as("__k"), col(rightTime).as("__t"), lit(0).as("__is_left"), payload.as("__payload"))

    val unioned = taggedLeft.unionByName(taggedRight, allowMissingColumns = true)
    // left rows sort BEFORE right rows at equal time ⇒ ">=" semantics
    val w = Window.partitionBy("__k").orderBy(col("__t"), col("__is_left").desc)
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    val filled = unioned.withColumn("__match", first(col("__payload"), ignoreNulls = true).over(w))

    filled.filter(col("__is_left") === 1)
      .select(leftCols.map(col) ++ rightCols.map(c => col("__match").getField(c).as(c)): _*)
  }
}
