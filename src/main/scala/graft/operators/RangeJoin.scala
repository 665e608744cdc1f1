package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (band) join: all right rows with `leftTime + lo <= rightTime <=
  * leftTime + hi` per key. Spark plans a naive `BETWEEN` predicate as a
  * broadcast-nested-loop or a sort-merge with per-row scanning; this
  * operator buckets time into `hi - lo`-sized chunks so the band becomes a
  * plain equi-join key:
  *
  *   left row  → bucket(leftTime)            (1 row)
  *   right row → buckets its band can touch  (≤ 2 rows after span/W + 1)
  *
  * then the exact band predicate filters inside the bucket — the standard
  * interval-bucketization that keeps a time-band join shuffle-bounded at
  * 100 TB (work ∝ matches + bucket collisions, never |L|·|R|).
  */
object RangeJoin {

  def bandJoin(left: DataFrame, right: DataFrame, key: String,
               leftTime: String, rightTime: String, lo: Long, hi: Long): DataFrame = {
    require(hi >= lo, "hi must be >= lo")
    val w = math.max(hi - lo, 1L)

    // left goes to the bucket of the BAND START (leftTime+lo); a band of
    // width w can overlap at most 2 buckets of size w, so the right side
    // registers under both its own bucket and the previous one.
    val lb = left
      .withColumn("__bucket", floor((col(leftTime) + lit(lo)).cast("long") / w))
    val rb = right
      .withColumn("__rbucket", floor(col(rightTime).cast("long") / w))
      .withColumn("__bucket", explode(array(col("__rbucket"), col("__rbucket") - 1)))
      .drop("__rbucket")

    lb.join(rb.withColumnRenamed(key, "__rk"),
        col(key) === col("__rk") && lb("__bucket") === rb("__bucket") &&
          col(rightTime) >= col(leftTime) + lo && col(rightTime) <= col(leftTime) + hi)
      .drop("__bucket").drop("__rk")
  }
}
