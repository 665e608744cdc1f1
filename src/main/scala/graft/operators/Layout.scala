package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Data-layout audit: Z-order (Morton-curve) clustering vs single-column
  * sort, measured by the min/max file-pruning statistics a lakehouse scan
  * actually uses.
  *
  * At 100 TB the cheapest query is the one that never reads the file:
  * parquet row-group and file skipping prune on per-file min/max ranges,
  * so the WRITE-side ordering decides every future scan's I/O. A single
  * -column sort gives perfect pruning on that column and none on any
  * other; interleaving the bits of two quantized columns (the Morton /
  * Z-order curve, Orenstein & Merrett 1984 — the layout behind
  * Delta/Iceberg OPTIMIZE ZORDER) bounds the per-file span on BOTH.
  * This operator is the audit that justifies the rewrite: it lays the
  * table out both ways and reports the average per-file span fraction
  * per dimension — the expected fraction of files a point/range filter
  * must read.
  *
  * Scale shape: quantization bounds come from ONE map-side-combined
  * 1-row agg (broadcast back — no second pass); the z-key is a pure
  * codegen'd integer expression in the scan projection. The global
  * row_number here MODELS the production write (`repartitionByRange`
  * on the z-key + `sortWithinPartitions` + one file per partition —
  * a range shuffle, never a driver sort); the summary then collapses
  * to |files| slim rows and ONE final row per layout.
  */
object Layout {

  /** Morton interleave of the low `bits` bits of `a` (odd positions) and
    * `b` (even positions) — disjoint bit positions, so `+` is `|` and the
    * whole key is one codegen'd integer expression tree.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).flatMap { i =>
      Seq(shiftleft(shiftright(a, i).bitwiseAND(lit(1L)), 2 * i + 1),
          shiftleft(shiftright(b, i).bitwiseAND(lit(1L)), 2 * i))
    }.reduce(_ + _)

  /** The same interleave as ANSI SQL (oracle replay). */
  def zSql(a: String, b: String, bits: Int = 16): String =
    (0 until bits).flatMap { i =>
      Seq(s"(((($a) >> $i) & 1) << ${2 * i + 1})", s"(((($b) >> $i) & 1) << ${2 * i})")
    }.mkString(" + ")

  /** Per-layout pruning summary over equal-size files: one row with the
    * file count and, per dimension, the summed span and the average span
    * FRACTION of the domain (what a uniform point filter expects to
    * scan). `orderCols` must be a total order or file assignment is not
    * reproducible.
    */
  private def summary(df: DataFrame, layout: String, rowsPerFile: Int,
                      dimA: String, dimB: String, orderCols: Seq[Column]): DataFrame =
    df.withColumn("rn", row_number().over(Window.orderBy(orderCols: _*)))
      .withColumn("file_id", expr(s"CAST((rn - 1) DIV $rowsPerFile AS BIGINT)"))
      .groupBy("file_id")
      .agg(min(col(dimA)).as("a_min"), max(col(dimA)).as("a_max"),
           min(col(dimB)).as("b_min"), max(col(dimB)).as("b_max"),
           count(lit(1)).as("n_rows"))
      .agg(count(lit(1)).as("n_files"), sum("n_rows").as("n_rows"),
           sum(col("a_max") - col("a_min") + lit(1L)).as("span_a"),
           sum(col("b_max") - col("b_min") + lit(1L)).as("span_b"))
      .withColumn("layout", lit(layout))

  /** The audit: rows laid out (1) by the z-curve over the quantized
    * (dimA, dimB) pair and (2) by dimA alone, same file size, same
    * summary. Quantization is affine integer floor-division scaling to
    * [0, 2^bits) over the observed domain — rank-free, engine-exact.
    * `tieCols` pins a total order under both layouts.
    */
  def zorderAudit(df: DataFrame, dimA: String, dimB: String,
                  rowsPerFile: Int, tieCols: Seq[String], bits: Int = 16): DataFrame = {
    val dom = df.agg(
      min(dimA).cast("long").as("a_lo"), max(dimA).cast("long").as("a_hi"),
      min(dimB).cast("long").as("b_lo"), max(dimB).cast("long").as("b_hi"))
      .persist() // 1 row, read by both layout branches and the final select
    Caches.register(dom)
    val scale = 1L << bits
    val wide = df.crossJoin(broadcast(dom))
      .withColumn("qa", expr(
        s"CAST(((CAST($dimA AS BIGINT) - a_lo) * ${scale}L) DIV (a_hi - a_lo + 1) AS BIGINT)"))
      .withColumn("qb", expr(
        s"CAST(((CAST($dimB AS BIGINT) - b_lo) * ${scale}L) DIV (b_hi - b_lo + 1) AS BIGINT)"))
    val ties = tieCols.map(col)
    val zs = summary(wide.withColumn("zkey", zValue(col("qa"), col("qb"), bits)),
      "zorder", rowsPerFile, dimA, dimB, col("zkey") +: ties)
    val ls = summary(wide, "linear_" + dimA, rowsPerFile, dimA, dimB, col(dimA) +: ties)
    zs.union(ls)
      .crossJoin(broadcast(dom))
      .select(col("layout"), col("n_files"), col("n_rows"), col("span_a"), col("span_b"),
        (col("span_a").cast("double") /
          (col("n_files") * (col("a_hi") - col("a_lo") + lit(1L))).cast("double")).as("frac_a"),
        (col("span_b").cast("double") /
          (col("n_files") * (col("b_hi") - col("b_lo") + lit(1L))).cast("double")).as("frac_b"))
  }
}
