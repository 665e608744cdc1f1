package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Embedding aggregation: chunk→document (or doc→cluster) vector pooling.
  *
  * The pipeline shape this serves: long documents embed per-chunk
  * ([[Pack.chunkTokens]] → encoder), and retrieval/dedup over DOCUMENTS
  * needs one vector per doc — the standard mean-pool. At 100 TB the
  * reduction must be distributed and deterministic; naive float summation
  * is neither reproducible (addition order varies with partitioning) nor
  * oracle-checkable.
  *
  * Design: elementwise mean via a (group, position) cell grid.
  *
  *  - `posexplode` fans each vector into (group, pos, value) cells —
  *    per-row work, no shuffle;
  *  - values QUANTIZE to micro-units (`round(v·10⁶)` as bigint): float
  *    inputs are exact in double, the scaled round is identical on every
  *    engine, and INTEGER sums are associative — any partitioning, any
  *    order, same cell sum (the same fixed-point trick as
  *    [[Curation.sourceQualityGate]]'s means);
  *  - one map-side-combined `groupBy(group, pos).sum` — the only
  *    data-sized shuffle, carrying slim (group, pos, long) cells;
  *  - the mean is ONE exactly-rounded double division per cell, and
  *    vectors reassemble ordered by position (`array_sort` on (pos, m)
  *    structs — `collect_list` here is bounded by the embedding DIM per
  *    group, never by group cardinality, unlike the id-array collects the
  *    near-dup family banned).
  *
  * Ragged inputs are well-defined: position p averages over the vectors
  * that HAVE a p-th element (count is per-cell), so pooling chunk
  * embeddings of mixed encoders fails soft rather than crashing — callers
  * wanting strict rectangularity can assert equal `size(vec)` upstream.
  */
object Embed {

  /** Per-group elementwise mean of `array<float/double>` vectors, exact
    * under any partitioning; returns (groupCol, mean_embedding:
    * array<double>) with means quantized-input-exact (micro-unit sums, one
    * final division per element).
    */
  def meanPool(df: DataFrame, groupCol: String, vecCol: String): DataFrame = {
    val cells = df
      .select(col(groupCol), posexplode(col(vecCol)).as(Seq("pos", "v")))
      .select(col(groupCol), col("pos"),
        round(col("v").cast("double") * lit(1000000.0)).cast("long").as("micro"))
    cells
      .groupBy(col(groupCol), col("pos"))
      .agg(sum("micro").as("s"), count(lit(1)).as("n"))
      .select(col(groupCol), col("pos"),
        (col("s").cast("double") / (col("n").cast("double") * lit(1000000.0))).as("m"))
      .groupBy(col(groupCol))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
        x => x.getField("m")).as("mean_embedding"))
  }
}
