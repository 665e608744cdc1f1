package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Corpus-curation gates ABOVE single-document granularity: decisions keyed
  * by a grouping column (source / domain / crawl snapshot) that a per-row
  * filter can't express because the verdict depends on the group's
  * aggregate statistics.
  */
object Curation {

  /** Source-level quality gate: keep documents whose SOURCE's mean quality
    * is at or above the corpus-wide mean — the domain-blocklist shape of a
    * pretraining pipeline (a low-quality domain is dropped wholesale, even
    * its above-average pages).
    *
    * Output: one row per surviving document — (id, src, quality, src_avg),
    * so downstream stages can re-weight by how far a source clears the bar.
    *
    * Plan, sized for 100 TB: the scoring pass runs once (persisted slim
    * (id, src, quality) frame, registered with [[Caches]]); the per-source
    * stats aggregate it with map-side combine down to |distinct sources|
    * rows, and the corpus mean derives from those stats (a second
    * aggregation of an already-tiny frame — the documents are NOT scanned
    * again). The gate itself is a BROADCAST join: document rows never
    * shuffle — each row does a map-side hash lookup of its source's
    * verdict. Total corpus-sized work: one scan, zero shuffles of the
    * documents.
    */
  def sourceQualityGate(docs: DataFrame, idCol: String, srcCol: String,
                        quality: Column): DataFrame = {
    val scored = docs
      .select(col(idCol), col(srcCol), quality.as("quality"))
      .persist()
    Caches.register(scored)
    val srcStats = scored.groupBy(col(srcCol))
      .agg(avg(col("quality")).as("src_avg"), count(lit(1)).as("src_docs"))
    // corpus mean = docs-weighted mean of the per-source means: exact, and
    // computed from the ~|sources|-row stats frame instead of rescanning.
    val corpus = srcStats.agg(
      (sum(col("src_avg") * col("src_docs")) / sum(col("src_docs"))).as("corpus_avg"))
    val passing = srcStats
      .crossJoin(broadcast(corpus))
      .filter(col("src_avg") >= col("corpus_avg"))
      .select(col(srcCol), col("src_avg"))
    scored.join(broadcast(passing), srcCol)
      .select(col(idCol), col(srcCol), col("quality"), col("src_avg"))
  }
}
