package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance for additive aggregates:
  * merge a delta batch's partial aggregate into the standing MV instead
  * of recomputing from the base table.
  *
  * The 100 TB argument is the whole point: a daily-revenue MV over a
  * 10¹²-row fact table costs one full scan to build; each day's refresh
  * should cost ONE pass over the DELTA (10⁸ rows) plus a |MV|-sized
  * merge — never the base scan again. Additive aggregates (SUM, COUNT —
  * and MIN/MAX under insert-only deltas) merge exactly: the refreshed MV
  * is bit-identical to a recompute, which the spec asserts and the
  * oracle replays.
  *
  * Mechanics: delta collapses map-side to its own per-key partials, then
  * ONE full-outer join on the MV key (bucket the MV by this key at scale
  * and the join co-locates); each measure merges null-safely. Keys seen
  * only in the delta appear; keys untouched by the delta pass through.
  */
object MvRefresh {

  /** Merge per-key (cnt, sum) partials of `delta` into `mv`.
    * Both frames carry (keyCols..., n_rows, sum_u); output is the same
    * shape — a refreshable fixpoint.
    */
  def refresh(mv: DataFrame, delta: DataFrame, keyCols: Seq[String]): DataFrame = {
    val m = mv.select(keyCols.map(col) :+ col("n_rows").as("n_a") :+ col("sum_u").as("s_a"): _*)
    val d = delta.select(keyCols.map(col) :+ col("n_rows").as("n_b") :+ col("sum_u").as("s_b"): _*)
    m.join(d, keyCols, "full_outer")
      .select(keyCols.map(col) ++ Seq(
        (coalesce(col("n_a"), lit(0L)) + coalesce(col("n_b"), lit(0L))).as("n_rows"),
        (coalesce(col("s_a"), lit(0L)) + coalesce(col("s_b"), lit(0L))).as("sum_u")): _*)
  }

  /** The (cnt, sum) partial aggregate both the MV build and each delta
    * batch use — micro-unit exact, so merge and recompute agree bitwise.
    */
  def partial(rows: DataFrame, keyCols: Seq[String], valueExpr: org.apache.spark.sql.Column): DataFrame =
    rows.groupBy(keyCols.map(col): _*)
      .agg(count(lit(1)).as("n_rows"), sum(valueExpr).as("sum_u"))

  /** Delta partial for a JOIN view V = γ(A ⋈ B) under insert-only deltas
    * on BOTH sides: the textbook two-quadrant rule
    *
    *   ΔV = γ(ΔA ⋈ B_new) ⊎ γ(A_old ⋈ ΔB)
    *
    * (ΔA ⋈ B_new already contains ΔA ⋈ ΔB, so three quadrants collapse to
    * two joins and the old⋈old quadrant — the expensive one at 100 TB —
    * is NEVER re-joined). Merge the result into the standing MV with
    * [[refresh]]; the refreshed view is bit-identical to a full rebuild,
    * which the `q_mv_join_refresh` oracle gates as an identity (the
    * DuckDB side computes the REBUILD).
    *
    * Both joins shuffle delta-sized frames against the join key; bucket
    * A and B by `joinKeys` at scale and they co-locate.
    */
  def joinPartialDelta(aOld: DataFrame, aDelta: DataFrame,
                       bNew: DataFrame, bDelta: DataFrame,
                       joinKeys: Seq[String], keyCols: Seq[String],
                       valueExpr: org.apache.spark.sql.Column): DataFrame =
    partial(
      aDelta.join(bNew, joinKeys).unionByName(aOld.join(bDelta, joinKeys)),
      keyCols, valueExpr)
}
