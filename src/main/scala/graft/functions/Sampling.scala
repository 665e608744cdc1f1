package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-independent sampling/splitting for training-data
  * pipelines. RNG-based `sample()` is neither reproducible across engines
  * nor stable under repartitioning; hashing the record key is both — the
  * same document lands in the same split on any engine, any cluster size,
  * any day (the property dataset curation actually needs).
  *
  * Bucket = md5-derived uint64 of the key, mod `buckets`. The exact hash
  * value matches DuckDB's `md5_number_lower(key) % buckets` (little-endian
  * uint64 of digest bytes 8-15), so splits are verifiable by the oracle.
  */
object Sampling {

  /** md5-derived uint64 of the key as decimal(20,0) — exactly DuckDB's
    * `md5_number_lower(key)` (little-endian uint64 of digest bytes 8..15 ==
    * byte-reversed hex chars 17..32), the cross-engine hash primitive every
    * deterministic sample/sketch in the library builds on.
    */
  def md5Lower(key: Column): Column = {
    val h = md5(key.cast("string"))
    val hexLe = concat((7 to 0 by -1).map(i => substring(h, 17 + 2 * i, 2)): _*)
    conv(hexLe, 16, 10).cast("decimal(20,0)")
  }

  /** Uniform bucket in [0, buckets) from the md5 of the key. Routed through
    * the native `graft_md5_mod` (r12) — value-identical to
    * `pmod(md5Lower(key), buckets)` (fuzz-pinned in SketchSpec) without the
    * per-row hex round-trip + decimal(20,0) arithmetic; repeated keys hit
    * the digest memo.
    */
  def md5Bucket(key: Column, buckets: Int): Column =
    graft.plans.NativeHash.md5Mod(key.cast("string"), buckets.toLong).cast("int")

  /** train/val/test assignment by bucket percentage (e.g. 80/10/10). */
  def split(key: Column, trainPct: Int, valPct: Int): Column = {
    val b = md5Bucket(key, 100)
    when(b < trainPct, "train")
      .when(b < trainPct + valPct, "val")
      .otherwise("test")
  }

  /** Deterministic pct% sample predicate. */
  def sampled(key: Column, pct: Int): Column = md5Bucket(key, 100) < pct

  /** Deterministic WEIGHTED Bernoulli keep: row kept iff its salted hash
    * point u ∈ [0,1) falls below the per-row probability `prob` — the
    * CCNet-style importance-sampling shape (keep ∝ quality) without RNG:
    * reproducible across runs/partitionings, and MONOTONE in prob (u is
    * fixed per key, so raising a row's probability can only add it, never
    * swap the sample). u = 32 low-order hash bits, compared in exact
    * doubles; the salt decorrelates the draw from [[split]]'s buckets,
    * which hash the unsalted key.
    */
  def weightedSampled(key: Column, prob: Column, salt: String = "ws"): Column =
    graft.plans.NativeHash.md5Mod(concat(lit(salt + ":"), key.cast("string")), 4294967296L)
      .cast("double") < prob * lit(4294967296.0)

  /** Stratified deterministic sample predicate: per-stratum keep
    * percentages (rebalancing a skewed corpus — keep 10% of the dominant
    * language, 100% of the rare ones). Same hash-bucket mechanics as
    * [[sampled]], so the sample is reproducible across engines and stable
    * under repartitioning; default applies to strata not listed.
    */
  def stratifiedSampled(key: Column, stratum: Column, pcts: Map[String, Int],
                        defaultPct: Int): Column = {
    val b = md5Bucket(key, 100)
    val pctCol = pcts.foldLeft(lit(defaultPct)) { case (acc, (s, p)) =>
      when(stratum === s, p).otherwise(acc)
    }
    b < pctCol
  }
}
