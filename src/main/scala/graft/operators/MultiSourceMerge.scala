package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** One sub-source feeding a multi-source merge: its rows, the column holding
  * the join key, the fields to graft onto the base set, and the column that
  * defines recency among duplicate keys (the reference's "later rows win":
  * /root/reference/src/Model/DataSetCollection.php:84-110).
  */
final case class SubSourceFeed(df: DataFrame, key: String, fields: Seq[String], orderCol: String)

/** Distributed re-expression of the reference's multi-source mode
  * (/root/reference/src/Service/Aggregator/Aggregator.php:110-136):
  * the first source builds a keyed set (last-write-wins on the key), each
  * later source left-join-updates its listed fields onto existing keys —
  * keys absent from the base are dropped, matched fields overwrite.
  *
  * Scale: each step is one equi-join on the same key, so Catalyst reuses a
  * single hash-partitioning across the whole chain; callers wrap dim-sized
  * sub-source frames in `broadcast()` to keep them off the shuffle entirely.
  */
object MultiSourceMerge {

  /** @param keepOrderCol carry the base set's recency (`max(baseOrderCol)`
    *                      per key) through the merge so the caller's final
    *                      dedupe has a genuine per-row order column
    */
  def merge(base: DataFrame, baseKey: String, baseOrderCol: String, subs: Seq[SubSourceFeed],
            keepOrderCol: Boolean = false): DataFrame =
    subs.foldLeft(KeyedMergeSet.dedupe(base, baseKey, Map.empty, baseOrderCol, keepOrderCol)) { (acc, sub) =>
      val subKey = s"__sub_${sub.key}"
      val dedup = KeyedMergeSet.dedupe(
          sub.df.select((sub.key +: sub.orderCol +: sub.fields).distinct.map(col): _*),
          sub.key, Map.empty, sub.orderCol)
        .select((sub.key +: sub.fields).map(col): _*)
        .withColumnRenamed(sub.key, subKey)
        .withColumnsRenamed(sub.fields.map(f => f -> s"__new_$f").toMap)
      val joined = acc.join(dedup, acc(baseKey) === dedup(subKey), "left")
      // Matched → overwrite with the sub's value (even if null, as the
      // reference does); unmatched → keep the base value / null for fields
      // the base never had.
      val updated = sub.fields.foldLeft(joined) { (d, f) =>
        val base = if (acc.columns.contains(f)) d(f) else lit(null)
        d.withColumn(f, when(d(subKey).isNotNull, d(s"__new_$f")).otherwise(base))
      }
      updated.drop(subKey +: sub.fields.map(f => s"__new_$f"): _*)
    }
}
