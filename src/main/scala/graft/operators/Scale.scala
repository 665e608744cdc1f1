package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Skew- and layout-management operators (SURVEY.md §4). AQE handles most
  * runtime skew; these are the explicit tools for when the skew is known
  * ahead of time (hot keys in a fact⋈fact join) or the layout should be
  * decided at write time (repeated co-located joins on one key).
  */
object Scale {

  /** Salted equi-join for skewed left (fact) sides: the left's hot keys
    * spread over `salts` sub-keys; the right side replicates each row
    * `salts` times. Correct for 1:N joins where the right is the "1" side.
    *
    * At 100 TB: a single hot key (null-ish UPCs, boilerplate fingerprints)
    * otherwise pins one reducer; salting caps per-task input at
    * |hot key| / salts at the cost of replicating the small side.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String, salts: Int,
                 joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    val saltedLeft = left.withColumn("__salt", (rand(seed = 7) * salts).cast("int"))
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLeft.join(saltedRight,
        saltedLeft(key) === saltedRight(key) && saltedLeft("__salt") === saltedRight("__salt"),
        joinType)
      .drop(saltedRight(key)).drop("__salt")
  }

  /** Distributed global row number 1..N in `orderCols` order — the
    * scale-correct replacement for `row_number() OVER (ORDER BY …)`, whose
    * empty window frame moves ALL data to one task.
    *
    * Mechanics (the zipWithIndex pattern, kept inside Catalyst): range-
    * partition on the order columns, number rows per partition with a
    * partition-local window, then add each partition's starting offset —
    * a driver-side cumulative sum over the ≤ `partitions` per-partition
    * counts, looked up via a literal map (no broadcast join, no
    * single-partition window anywhere). Rows tying on `orderCols` get
    * arbitrary relative order, exactly like the window formulation.
    *
    * Costs one extra pass for the counts; the range-partitioned frame is
    * persisted between the two jobs and registered with [[Caches]] —
    * long-running callers release via `Caches.release()`.
    */
  def globalRowNumber(df: DataFrame, orderCols: Seq[String], out: String = "row_idx",
                      partitions: Int = 0): DataFrame = {
    val cols = orderCols.map(col)
    val n = if (partitions > 0) partitions
            else df.sparkSession.sessionState.conf.numShufflePartitions
    // monotonically_increasing_id over the range-sorted frame encodes
    // (partitionId << 33) | in-order-offset — a partition-local row number
    // with NO window and no second shuffle
    val sorted = df.repartitionByRange(n, cols: _*)
      .sortWithinPartitions(cols: _*)
      .withColumn("__mid", monotonically_increasing_id())
      .persist()
    Caches.register(sorted)
    val pid = shiftright(col("__mid"), 33)
    val localOff = col("__mid").bitwiseAND(lit((1L << 33) - 1))
    val counts = sorted.groupBy(pid.as("__pid")).count()
      .collect().map(r => r.getLong(0) -> r.getLong(1))
    val offsets = counts.sortBy(_._1)
      .scanLeft((-1L, 0L, 0L)) { case ((_, acc, _), (p, c)) => (p, acc + c, acc) }
      .drop(1)
    val offExpr =
      if (offsets.isEmpty) lit(0L)
      else coalesce(element_at(
        map(offsets.toIndexedSeq.flatMap { case (p, _, off) => Seq(lit(p), lit(off)) }: _*), pid), lit(0L))
    sorted
      .withColumn(out, (offExpr + localOff + lit(1L)).cast("long"))
      .drop("__mid")
  }

  /** Write a frame bucketed+sorted by the join key. Two tables bucketed the
    * same way join with ZERO exchange on either side — the layout-time
    * answer to "this key is joined every night".
    */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int): Unit =
    df.write.mode("overwrite")
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)

  /** Join two bucketed tables on their bucket key (exchange-free when both
    * sides were written with [[writeBucketed]] and the same bucket count).
    */
  def bucketedJoin(spark: SparkSession, leftTable: String, rightTable: String,
                   key: String): DataFrame =
    spark.table(leftTable).join(spark.table(rightTable), key)
}
