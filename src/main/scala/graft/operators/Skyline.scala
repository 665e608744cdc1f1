package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pareto-front (skyline) queries — "no other row is at least as good on
  * both axes and strictly better on one" (Börzsönyi/Kossmann/Stocker,
  * ICDE'01 — the public formulation). The naive form is a quadratic
  * NOT-EXISTS self-join; in 2-D it collapses to one ordered scan.
  */
object Skyline {

  /** 2-D skyline: rows minimizing `minCol` while maximizing `maxCol`.
    * q dominates p ⇔ q.min ≤ p.min ∧ q.max ≥ p.max ∧ (one strict).
    *
    * Ordered-scan identity: p survives ⇔ p.max equals the best `maxCol`
    * at its own `minCol` value AND strictly beats the best `maxCol` over
    * everything cheaper. So: one group-by to the distinct-`minCol` frame,
    * one [[Scale.strictPrefixMax]] scan over it (two-level — no
    * single-task window), one equi-join back. O(n) + a distinct-value
    * scan vs the oracle's O(n²) dominance test; ties on both axes
    * survive together (no strict dominator), matching the definition.
    */
  def pareto2d(df: DataFrame, minCol: String, maxCol: String): DataFrame = {
    // the scan compares maxCol as long; a fractional axis would truncate
    // and silently return wrong skyline rows, so integral types only
    val maxType = df.schema(maxCol).dataType
    require(Seq("ByteType", "ShortType", "IntegerType", "LongType")
        .contains(maxType.toString),
      s"pareto2d maxCol '$maxCol' must be integral, got $maxType")
    val g = df.groupBy(col(minCol).as("__x")).agg(max(col(maxCol).cast("long")).as("__gmax"))
    val scanned = Scale.strictPrefixMax(g, Seq("__x"), "__gmax", "__before")
    df.join(scanned, df(minCol) === scanned("__x"))
      .filter(col(maxCol).cast("long") === col("__gmax") &&
        (col("__before").isNull || col("__gmax") > col("__before")))
      .drop("__x", "__gmax", "__before")
  }
}
