package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Mergeable quantile sketch as a log2-linear histogram (the HDR-Histogram
  * bucket scheme, Gil Tene's public formulation; same γ-bucket idea as
  * DDSketch, Masson et al. VLDB'19, but with POWER-OF-TWO buckets so every
  * index computes in pure integer arithmetic — no `log`, whose last-ulp
  * rounding is not pinned across engines).
  *
  * Bucket index for v ≥ 0 with `subBits` = s:
  *   v < 2^s           → v                        (exact small values)
  *   else, e = msb(v)  → (e − s)·2^s + ⌊v / 2^(e−s)⌋
  * Each bucket spans ≤ 2^(e−s), its lower bound is ≥ 2^e, so the relative
  * rank-value error is ≤ 2^−s — the DDSketch guarantee, integer-only.
  *
  * Why this is THE percentile MV: bucket counts are plain integers and
  * merge by ADDITION — associative, commutative, lossless w.r.t. the
  * sketch state — so refresh ≡ rebuild holds BITWISE (the
  * [[MvRefresh]] / HLL-register-max posture exactly; KLL/REQ compaction
  * sampling could not replay in SQL, and its merge is not
  * rebuild-identical). Every percentile operator that re-reads the full
  * value-grain histogram per refresh (`q_ship_lag`'s engine) gets an
  * incremental twin: per-(key, shard) sketch rows, one group-add merge
  * per delta batch, quantile reads off the |keys|·O(64·2^s)-bounded
  * sketch — control-plane-sized at ANY corpus scale.
  *
  * Determinism: msb position is `length(bin(v)) − 1` (both engines print
  * minimal binary strings), the shift is one integer division by an
  * exactly-representable power of two, and quantile thresholds compare
  * `cum·den ≥ n·num` in integers — no doubles anywhere.
  */
object Hdr {

  /** Log2-linear bucket index of a non-negative integral column.
    * The shift ⌊v / 2^(e−s)⌋ is a double division by an exact power of two
    * below 2^53 (only the exponent changes), then truncation — bit-exact,
    * and the same arithmetic DuckDB's `//` replays as integer division.
    *
    * Domain is GUARDED, not assumed (the Scale.requireIntegral /
    * Skyline fail-loud convention): a negative value would silently land
    * in the small-value branch as a negative index, and a value ≥ 2^53
    * would silently lose bits in the double divide — both now raise
    * instead of mis-bucketing, since [[hdrSketchWindowed]]-style callers
    * expose this to arbitrary user columns.
    */
  def bucketOf(v: Column, subBits: Int): Column = {
    require(subBits >= 1 && subBits <= 16, s"subBits out of range: $subBits")
    val base = 1L << subBits
    val vl = v.cast("long")
    val e = (length(bin(vl)) - lit(1)).cast("int")
    when(vl < lit(0L) || vl >= lit(1L << 53),
        raise_error(concat(lit("Hdr.bucketOf: value out of [0, 2^53) domain: "),
          vl.cast("string"))).cast("long"))
      .when(vl < lit(base), vl)
      .otherwise((e - lit(subBits)).cast("long") * lit(base) +
        (vl.cast("double") / pow(lit(2.0), (e - lit(subBits)).cast("double"))).cast("long"))
  }

  /** Inclusive lower bound of bucket index `i` — the value the quantile
    * read reports (true quantile ∈ [lowerBound(i), lowerBound(i+1))).
    */
  def lowerBound(i: Column, subBits: Int): Column = {
    val base = 1L << subBits
    val block = (i.cast("double") / lit(base.toDouble)).cast("long") // exact: i ≪ 2^53
    when(i < lit(base), i.cast("long"))
      .otherwise((i.cast("long") - (block - lit(1)) * lit(base)) *
        pow(lit(2.0), (block - lit(1)).cast("double")).cast("long"))
  }

  /** Per-key sketch: (keyCols…, bucket, cnt) — ONE map-side-combined
    * aggregation over the rows; this is both the MV build and the delta
    * partial (identical code path, so merge and rebuild agree bitwise).
    */
  def sketchBy(rows: DataFrame, keyCols: Seq[String], valueCol: String,
               subBits: Int): DataFrame =
    rows.select(keyCols.map(col) :+ bucketOf(col(valueCol), subBits).as("bucket"): _*)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("cnt"))

  /** Refresh: bucket-wise count ADDITION — the whole merge is one
    * group-add over the two sketch row sets (union + re-agg keeps the
    * map-side combine; at scale both sides are |keys|·|buckets|-sized,
    * never corpus-sized).
    */
  def mergeBy(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame =
    a.unionByName(b)
      .groupBy((keyCols :+ "bucket").map(col): _*)
      .agg(sum("cnt").as("cnt"))

  /** Range-partition SPLIT PLAN off a sketch: per key, the `parts − 1`
    * boundary values (bucket lower bounds) where the CDF crosses j·n/parts,
    * plus the exact row count at-or-under each boundary's bucket. This is
    * the deterministic replacement for Spark's sampled RangePartitioner at
    * 100 TB: the standing sketch already knows the distribution, so split
    * points cost one |sketch|-sized walk — no re-sampling pass over the
    * corpus, no sampling nondeterminism between runs, and each resulting
    * range holds n/parts rows within one bucket's mass (≤ 2⁻ˢ relative).
    */
  def splitPlan(sketch: DataFrame, keyCols: Seq[String], subBits: Int,
                parts: Int): DataFrame = {
    require(parts >= 2, s"parts must be >= 2, got $parts")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("bucket")
    val cum = sketch
      .withColumn("hi", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("lo", lowerBound(col("bucket"), subBits))
      // |keys|·|buckets|·(parts−1) rows — control-plane sized
      .withColumn("split_no", explode(sequence(lit(1), lit(parts - 1))))
      .filter(col("hi") * lit(parts) >= col("n") * col("split_no"))
    cum.groupBy((keyCols :+ "split_no").map(col): _*)
      .agg(min("lo").as("split_lb"), min("hi").as("rows_le"))
  }

  /** Quantile read off a sketch: per key, the lower bound of the bucket
    * holding the ⌈num/den·n⌉-th value, for each (num, den, name) —
    * integer threshold compare (cum·den ≥ n·num), windows partitioned by
    * key over the ≤ 64·2^subBits bucket rows per key.
    */
  def quantiles(sketch: DataFrame, keyCols: Seq[String], subBits: Int,
                ps: Seq[(Int, Int, String)]): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(keyCols.map(col): _*).orderBy("bucket")
    val cum = sketch
      .withColumn("hi", sum("cnt").over(w))
      .withColumn("n", sum("cnt").over(
        org.apache.spark.sql.expressions.Window.partitionBy(keyCols.map(col): _*)))
      .withColumn("lo", lowerBound(col("bucket"), subBits))
    cum.groupBy(keyCols.map(col): _*)
      .agg(max("n").as("n_rows"),
        ps.map { case (num, den, name) =>
          min(when(col("hi") * lit(den) >= col("n") * lit(num), col("lo"))).as(name)
        }: _*)
  }
}
