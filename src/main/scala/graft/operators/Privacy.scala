package graft.operators

import graft.functions.Sampling
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Differentially-private release primitives for corpus statistics.
  *
  * The reference publishes supplier-level aggregates outward with no privacy
  * layer (`Aggregator.php:62-89` — every count leaves the pipeline exact);
  * the operation a training-data pipeline needs when REPORTING per-source /
  * per-domain corpus statistics beyond the trust boundary is the classic
  * counting-query release: perturb each count with noise calibrated to its
  * unit sensitivity.
  *
  * Mechanism: the GEOMETRIC mechanism — two-sided geometric noise, the
  * discrete analogue of Laplace and the utility-optimal choice for counting
  * queries (Ghosh, Roughgarden & Sundararajan, "Universally Utility-
  * Maximizing Privacy Mechanisms", STOC 2009). We fix α = 2^-j, i.e.
  * ε = j·ln 2, which makes the ENTIRE inverse CDF computable in exact
  * 64-bit integer arithmetic: no ln(), no doubles, so a draw is
  * bit-identical on every engine — the property the DuckDB oracle gate
  * needs and RNG-based noise can never give.
  *
  * Distribution: P(X = k) = ((1-α)/(1+α))·α^|k|. With α = 2^-j and a
  * 32-bit uniform U ∈ [0, 2^32):
  *
  *   U' = U + 1 ∈ [1, 2^32]      (shifts u away from the CDF's 0 endpoint)
  *   W⁻ = U'·(2^j + 1)
  *   W⁺ = (2^32 − U')·(2^j + 1)
  *
  *   X ≤ −m  (m ≥ 1)  ⟺  u < α^m/(1+α)  ⟺  W⁻ < 2^(32+j−jm)
  *                     ⟺  bitlen(W⁻) ≤ 32 + j − j·m
  *   so  X = −⌊(32 + j − bitlen(W⁻))/j⌋ when that is ≥ 1, and by symmetry
  *   X = +⌊(32 + j − bitlen(W⁺))/j⌋ on the upper tail. Strict vs non-strict
  *   never differs on achievable values: W = U'·(2^j+1) with 2^j+1 odd > 1
  *   can never be an exact power of two. The one boundary case is u = 1
  *   (W⁺ = 0, probability 2^-32), clamped to ⌊(31+j)/j⌋ — one past the
  *   largest magnitude any non-zero U'' can produce.
  *
  * Seeding: U is the md5-derived uint64 of a (salt, group-key) string
  * ([[Sampling.md5Lower]], the cross-engine hash primitive every
  * deterministic sample in the library builds on), so a released frame is
  * reproducible across runs, engines and partitionings. A seeded draw is a
  * fixed function of the key — the standard reproducibility trade-off of
  * production DP pipelines (fresh randomness per RELEASE, not per row; the
  * privacy argument holds per released artifact, and re-keying the salt is
  * what issuing a new release means here).
  */
object Privacy {

  /** Two-sided geometric noise with α = 2^-j (ε = j·ln 2), drawn
    * deterministically from the md5 of `key`. Exact integer arithmetic
    * throughout — see the object doc for the derivation. Returns LONG.
    */
  def geometricNoise(key: Column, j: Int): Column = {
    require(j >= 1 && j <= 8, s"j (epsilon in ln-2 units) must be in [1,8], got $j")
    val t = 4294967296L // 2^32
    val a = (1L << j) + 1L // 2^j + 1, odd — the no-power-of-two guarantee
    val u1 = (pmod(Sampling.md5Lower(key), lit(t)).cast("long") + lit(1L)).as("u1")
    val wNeg = u1 * lit(a)
    val wPos = (lit(t) - u1) * lit(a)
    // ⌊(32 + j − bitlen(W))/j⌋ — operands are tiny exact ints, so the
    // double floor-division is exact.
    def mOf(w: Column): Column =
      floor((lit((32 + j).toDouble) - length(bin(w)).cast("double")) / lit(j.toDouble))
        .cast("long")
    val mN = mOf(wNeg)
    val mP = mOf(greatest(wPos, lit(1L)))
    val clamp = ((31 + j) / j).toLong
    when(mN >= 1, -mN)
      .when(wPos === 0L, lit(clamp))
      .when(mP >= 1, mP)
      .otherwise(lit(0L))
  }

  /** Noisy group counts: one row per (group, j) for each ε = j·ln 2 in
    * `js`, with the true count, the geometric noise drawn from
    * (salt, group-values, j), and the released max(0, n + noise).
    * `n_true` rides along because the gated frame is a TEST artifact —
    * a real release ships only (group, eps, n_noisy).
    */
  def noisyCounts(grouped: org.apache.spark.sql.DataFrame, groupCols: Seq[String],
                  countCol: String, js: Seq[Int], salt: String = "dp")
  : org.apache.spark.sql.DataFrame = {
    js.map { j =>
      val key = concat_ws("|",
        (lit(salt + j) +: groupCols.map(c => col(c).cast("string"))): _*)
      grouped.select(
        (groupCols.map(col) :+ lit(j).as("eps_ln2") :+ col(countCol) :+
          geometricNoise(key, j).as("noise")): _*)
    }.reduce(_ unionByName _)
      .withColumn("n_noisy", greatest(lit(0L), col(countCol) + col("noise")))
  }

  /** Differentially-private MEDIAN per group via the EXPONENTIAL mechanism
    * (McSherry & Talwar, FOCS 2007) over the observed value grid,
    * TRUNCATED so every weight is an exact 64-bit power of two and the
    * whole selection runs in exact 128-bit integer arithmetic — the third
    * classic mechanism next to [[geometricNoise]]'s counting release.
    *
    * Shape: value-grain collapse first (`groupBy(group, value)` — the
    * 100 TB move: all windows below run over ≤|grid| rows per group, never
    * the data), then per candidate value v:
    *
    *   u(v)   = half-rank distance from v's RANK INTERVAL
    *            [less+1, less+cnt] to the median rank (n+1)/2 — 0 when
    *            the interval contains it, i.e.
    *            max(0, 2·less+1−n, n+1−2·(less+cnt)); interval (not
    *            midpoint) distance matters because a heavily-tied grid
    *            cell CONTAINING the median must score u = 0, exactly as
    *            the exponential mechanism over raw ranks would
    *   W_j(v) = 2^(62 − j·u(v))  when ≥ 1, else 0
    *
    * i.e. weight ∝ α^u with α = 2^-j; candidates further than 62/j
    * half-ranks collapse to weight 0 — a ≤2^-30 statistical-distance
    * truncation of the exact mechanism (the untruncated tail mass is
    * below 2·2^-62·|grid| of the total, since the median candidate always
    * holds weight ≥ 2^61). ε grows linearly in j (the exact constant
    * depends on the neighboring-dataset convention; one add/remove moves
    * every u by ≤ 2 half-units).
    *
    * Selection is inverse-CDF on the cumulative weights with the same
    * md5-seeded 32-bit uniform as every release here, DIVISION-FREE:
    * pick the first v with cumW(v)·2^32 > U·totW — both sides exact in
    * decimal(38,0) (Spark) / HUGEINT (DuckDB), so the draw is
    * bit-identical cross-engine. U = totW-boundary cases resolve the same
    * way on both sides because the comparison is exact.
    *
    * Output: one row per (group, j): n, the true lower median (test
    * artifact — a real release ships only dp_median), dp_median.
    */
  def dpMedianByGroup(rows: org.apache.spark.sql.DataFrame, groupCol: String,
                      valueCol: String, js: Seq[Int], salt: String = "dpm")
  : org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(groupCol).orderBy(valueCol)
    val byG = Window.partitionBy(groupCol)
    val vg = rows.groupBy(groupCol, valueCol).agg(count(lit(1)).as("cnt"))
    val cum = vg
      .withColumn("less", coalesce(
        sum("cnt").over(w.rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .withColumn("n", sum("cnt").over(byG))
      .withColumn("u", greatest(lit(0L),
        lit(2) * col("less") + lit(1) - col("n"),
        col("n") + lit(1) - lit(2) * (col("less") + col("cnt"))))
    val truth = cum
      .filter(lit(2) * (col("less") + col("cnt")) >= col("n"))
      .groupBy(groupCol).agg(min(valueCol).as("true_median"))
    js.map { j =>
      val key = concat_ws("|", lit(salt + j), col(groupCol).cast("string"))
      val uu = pmod(Sampling.md5Lower(key), lit(4294967296L)).cast("decimal(38,0)")
      cum
        .withColumn("wgt", expr(
          s"CASE WHEN 62 - $j * u >= 0 THEN shiftleft(CAST(1 AS BIGINT), CAST(62 - $j * u AS INT)) " +
          "ELSE CAST(0 AS BIGINT) END").cast("decimal(38,0)"))
        .withColumn("cum_w", sum("wgt").over(w))
        .withColumn("tot_w", sum("wgt").over(byG))
        .withColumn("u32", uu)
        .filter(col("cum_w") * lit(4294967296L).cast("decimal(38,0)") >
          col("u32") * col("tot_w"))
        .groupBy(groupCol)
        .agg(max("n").as("n"), min(valueCol).as("dp_median"))
        .withColumn("eps_ln2", lit(j))
    }.reduce(_ unionByName _)
      .join(truth, Seq(groupCol))
      .select(col(groupCol), col("eps_ln2"), col("n"),
        col("true_median"), col("dp_median"))
  }

  /** The DuckDB mirror of [[geometricNoise]] + [[noisyCounts]] as a CTE
    * chain, so every DP oracle replays ONE pinned formula. Expects a
    * preceding CTE `g` with columns (`groupCols`…, `countCol`); emits
    * CTEs `e/u/w/m/n` where `n` has (groupCols…, eps_ln2 INT, countCol,
    * noise BIGINT). Callers append their own final SELECT (adding
    * `greatest(0, count + noise)` etc.).
    */
  def oracleNoiseCtes(groupCols: Seq[String], countCol: String, js: Seq[Int],
                      salt: String): String = {
    val keySql = groupCols.map(c => s"g.$c").mkString(" || '|' || ")
    val gCols = groupCols.mkString(", ")
    s"""e AS (SELECT unnest([${js.mkString(", ")}]) AS eps_ln2),
       |u AS (
       |  SELECT g.*, e.eps_ln2,
       |    CAST(md5_number_lower('$salt' || e.eps_ln2 || '|' || $keySql)
       |         % 4294967296 AS BIGINT) + 1 AS u1,
       |    CAST((CAST(1 AS BIGINT) << e.eps_ln2) + 1 AS BIGINT) AS a
       |  FROM g, e),
       |w AS (SELECT *, u1 * a AS wneg, (4294967296 - u1) * a AS wpos FROM u),
       |m AS (SELECT *,
       |    CAST(floor((32 + eps_ln2 - len(bin(wneg))) * 1.0 / eps_ln2) AS BIGINT) AS mneg,
       |    CAST(floor((32 + eps_ln2 - len(bin(greatest(wpos, 1)))) * 1.0 / eps_ln2) AS BIGINT) AS mpos
       |  FROM w),
       |n AS (
       |  SELECT $gCols, CAST(eps_ln2 AS INT) AS eps_ln2, $countCol,
       |    CASE WHEN mneg >= 1 THEN -mneg
       |         WHEN wpos = 0 THEN CAST((31 + eps_ln2) // eps_ln2 AS BIGINT)
       |         WHEN mpos >= 1 THEN mpos
       |         ELSE 0 END AS noise
       |  FROM m)""".stripMargin
  }
}
