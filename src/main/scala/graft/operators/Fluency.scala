package graft.operators

import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-relative bigram fluency scoring — the CCNet-style "LM quality"
  * signal computed without an external model: the corpus itself is the
  * language model. P(w₂|w₁) = c(w₁w₂) / c(w₁·) over all bigram occurrences;
  * a document's fluency is the mean of its bigrams' conditional
  * probabilities. Boilerplate and templated text (whose bigrams dominate
  * the corpus) score high; garbled or rare-construction text scores low —
  * the same ordering a perplexity filter produces, in linear space.
  *
  * Numeric contract: probabilities quantize to MILLIONTHS by exact integer
  * division — floor(10⁶·c₂/c₁) — so every per-bigram term, each per-doc sum,
  * and the final mean are integer-exact and order-invariant: bit-identical
  * on any engine, partitioning, or row order (log-space scores would drift
  * by ulps across engines; see the fixed-point sourceQualityGate note in
  * PLANS.md). The one double in the output divides two exact integers.
  *
  * Scale: one tokenize pass, then the occurrence stream immediately
  * REDUCES to per-(doc, w₁, w₂) counts — that aggregated frame persists,
  * both count tables re-aggregate it (map-side combined), and the
  * vocab-keyed count joins probe it instead of the raw occurrence
  * stream. This cuts join volume by the per-document repetition factor
  * and blunts head-word skew (a boilerplate page repeating "of the" 10⁴
  * times ships ONE row through the c₂/c₁ joins, not 10⁴); residual
  * cross-document head-word skew splits under AQE skew-join like the
  * rest of the dedup family (AqeSkewSpec). The joins are sort-merge at
  * web vocabularies, broadcast below the threshold — same posture as
  * TfIdf's df join. 10⁶·c₂ stays in BIGINT up to 9·10¹² occurrences of
  * a single bigram.
  */
object Fluency {

  /** Per-document bigram fluency over whitespace tokens (lowercased).
    * Documents with fewer than two tokens have no bigrams and are excluded.
    * Returns (idCol, n_bigrams, fluency_micro_sum, fluency).
    */
  def bigramFluency(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = docs
      .select(col(idCol), TF.tokens(col(textCol)).as("w"))
      .filter(size(col("w")) >= 2)
    // reduce occurrences to per-(doc, w1, w2) multiplicities BEFORE any
    // join: k·⌊10⁶·c2/c1⌋ ≡ the occurrence-wise sum, exactly, and the
    // joins now move |distinct bigrams per doc| rows instead of the
    // corpus token stream
    val g = toks
      .select(col(idCol),
        explode(zip_with(
          slice(col("w"), lit(1), size(col("w")) - 1),
          slice(col("w"), lit(2), size(col("w")) - 1),
          (a, b) => struct(a.as("w1"), b.as("w2")))).as("bg"))
      .groupBy(col(idCol), col("bg.w1").as("w1"), col("bg.w2").as("w2"))
      .agg(count(lit(1)).as("k"))
      .persist()
    Caches.register(g)
    val c2 = g.groupBy("w1", "w2").agg(sum("k").as("c2"))
    val c1 = g.groupBy("w1").agg(sum("k").as("c1"))
    g
      .join(c2, Seq("w1", "w2"))
      .join(c1, Seq("w1"))
      .select(col(idCol), col("k"), expr("(1000000L * c2) div c1").as("p_micro"))
      .groupBy(idCol)
      .agg(sum("k").as("n_bigrams"),
        sum(expr("k * p_micro")).as("fluency_micro_sum"))
      .withColumn("fluency",
        col("fluency_micro_sum").cast("double") /
          (col("n_bigrams") * lit(1000000L)).cast("double"))
  }
}
