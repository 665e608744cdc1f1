package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Distributed re-expression of the reference's `DataSetCollection`
  * (/root/reference/src/Model/DataSetCollection.php:26-82): a keyed set where
  * rows colliding on the unique index are merged per-field by rule —
  * "min" | "max" | "addArray" (collect) | default last-write-wins.
  *
  * The reference holds a driver-side hashmap keyed by the index — O(dataset)
  * in one process. Here it is one `groupBy(key)` with map-side partial
  * aggregation: a single hash shuffle of pre-combined partials, which scales
  * linearly with executors at 100 TB.
  *
  * "Last write wins" requires an explicit `orderCol`: on a cluster there is
  * no arrival order, so the caller names the column that defines recency
  * (a version, file sequence number, or ingest timestamp) and we take
  * `max_by(field, orderCol)`.
  */
object KeyedMergeSet {

  /** addArray collects values sorted for determinism (the reference's array
    * order is arrival order, which does not exist distributed); joined to a
    * string so downstream hashing is stable.
    */
  def mergeExpr(field: String, rule: Option[String], orderCol: String): Column = rule match {
    case Some("min")      => min(col(field)).as(field)
    case Some("max")      => max(col(field)).as(field)
    case Some("addArray") => array_join(sort_array(collect_list(col(field).cast("string"))), ",").as(field)
    case _                => max_by(col(field), col(orderCol)).as(field)
  }

  /** Dedupe `df` on `key`; rows with null/empty key are dropped (the
    * reference skips them: DataSetCollection.php:75-79).
    *
    * @param rules        field → merge rule; fields not listed use last-write-wins
    * @param orderCol     column defining recency for last-write-wins
    * @param keepOrderCol keep the group's recency (`max(orderCol)`) in the
    *                     output, so a later merge/dedupe stage can reuse it
    */
  def dedupe(df: DataFrame, key: String, rules: Map[String, String], orderCol: String,
             keepOrderCol: Boolean = false): DataFrame = {
    val valueCols = df.columns.filter(c => c != key && c != orderCol)
    val aggs = valueCols.map(f => mergeExpr(f, rules.get(f), orderCol)) ++
      (if (keepOrderCol) Seq(max(col(orderCol)).as(orderCol)) else Nil)
    require(aggs.nonEmpty, "KeyedMergeSet.dedupe needs at least one non-key column")
    df.filter(col(key).isNotNull && col(key).cast("string") =!= "")
      .groupBy(col(key))
      .agg(aggs.head, aggs.tail.toIndexedSeq: _*)
  }
}
