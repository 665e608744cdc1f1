package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector math over `array<float>` columns as sequential-fold
  * Catalyst expressions. The fold order is the element order in BOTH engines
  * (Spark `aggregate`, DuckDB `list_reduce`), so cosine values are
  * bit-identical to the oracle — which keeps ANN results under the exact
  * hash gate instead of an epsilon compare.
  */
object VectorFunctions {

  /** Σ aᵢ·bᵢ in double, strictly left-to-right. */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double, strictly left-to-right. */
  def normSq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, v) => acc + v.cast("double") * v.cast("double"))

  /** Fused native implementation (graft.plans.NativeHash.CosineSim) of the
    * same left-to-right fold — bit-identical output, no interpreted lambda
    * per element. `cosineDeclarative` keeps the pure-functions formulation
    * for reference/cross-checking.
    */
  def cosine(a: Column, b: Column): Column =
    graft.plans.NativeHash.cosine(a, b)

  def cosineDeclarative(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))

  /** Sign-bit LSH bucket id from `nPlanes` pseudo-random hyperplanes; plane
    * p's component j is the md5-derived value in [-0.5, 0.5) that DuckDB
    * reproduces bit-exactly (`md5_number_lower(p||':'||j) % 1000 / 1000 -
    * 0.5` — same machinery as [[Sampling.md5Bucket]]), so LSH bucket ids —
    * and therefore the whole bucketed-ANN result — sit under the oracle's
    * exact hash gate. Same-bucket vectors are ANN candidates — the 100 TB
    * path that turns brute-force O(n·q) into per-bucket re-ranking.
    */
  def lshBucket(v: Column, nPlanes: Int): Column =
    if (nPlanes <= 0) lit(0L)
    else graft.plans.NativeHash.lshBucket(v, nPlanes)

  /** Multi-table hyperplane LSH keys — OR-of-ANDs, the embedding twin of
    * banded minhash: key t = `(t << k) | sign-bits of planes [t·k, t·k+k)`,
    * one long per table, exploded into a plain equi-join. A pair is a
    * candidate iff SOME table's k planes all agree — recall at angle θ is
    * 1 − (1 − (1 − θ/π)^k)^L, driven to 1 by adding tables (L) while k
    * keeps each table's buckets small. Same md5 plane family as
    * [[lshBucket]] (table t owns global planes t·k..), so every key value
    * is DuckDB-reproducible and nTables=1 equals the single-table bucket.
    */
  def lshKeys(v: Column, nTables: Int, planesPerTable: Int): Column =
    graft.plans.NativeHash.lshKeys(v, nTables, planesPerTable)

  /** Pure-functions formulation of [[lshKeys]], for cross-checking. */
  def lshKeysDeclarative(v: Column, nTables: Int, planesPerTable: Int): Column =
    if (planesPerTable <= 0)
      transform(sequence(lit(0), lit(nTables - 1)), t => t.cast("long"))
    else
      transform(sequence(lit(0), lit(nTables - 1)), t => {
        val bits = aggregate(sequence(lit(0), lit(planesPerTable - 1)), lit(0L), (acc, p) => {
          val g = t * lit(planesPerTable) + p // global plane index
          val proj = aggregate(
            zip_with(v, sequence(lit(0), size(v) - 1), (x, j) =>
              x.cast("double") *
                (Sampling.md5Bucket(concat(g.cast("string"), lit(":"), j.cast("string")), 1000)
                  .cast("double") / lit(1000.0) - lit(0.5))),
            lit(0.0), (a, x) => a + x)
          when(proj > 0, acc.bitwiseOR(call_function("shiftleft", lit(1L), p))).otherwise(acc)
        })
        t.cast("long") * lit(1L << planesPerTable) + bits // == t << k
      })

  /** Pure-functions formulation of the same buckets, for cross-checking —
    * the interpreted md5 chain per (plane, dim) is ~15× slower.
    */
  def lshBucketDeclarative(v: Column, nPlanes: Int): Column =
    if (nPlanes <= 0) lit(0L)
    else {
      val bits = transform(sequence(lit(0), lit(nPlanes - 1)), p => {
        val proj = aggregate(
          zip_with(v, sequence(lit(0), size(v) - 1), (x, j) =>
            x.cast("double") *
              (Sampling.md5Bucket(concat(p.cast("string"), lit(":"), j.cast("string")), 1000)
                .cast("double") / lit(1000.0) - lit(0.5))),
          lit(0.0), (acc, x) => acc + x)
        when(proj > 0, call_function("shiftleft", lit(1L), p)).otherwise(lit(0L))
      })
      aggregate(bits, lit(0L), (acc, b) => acc.bitwiseOR(b))
    }
}
