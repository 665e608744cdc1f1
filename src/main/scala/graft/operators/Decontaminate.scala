package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Benchmark decontamination: remove training documents that overlap an
  * evaluation/benchmark corpus — the cross-corpus containment gate every
  * pretraining pipeline runs before training (distinct from WITHIN-corpus
  * dedup: here one side is a small protected set and the test is
  * directional containment, not symmetric jaccard).
  *
  * Method: n-gram shingle containment. Every benchmark document's word
  * n-grams union into one distinct shingle set; a corpus document is
  * contaminated when more than `maxOverlap` of ITS shingles appear in that
  * set. Short docs (< n words) contribute their whole text as one shingle.
  *
  * Scale: benchmark sets are eval suites — tiny next to a 100 TB corpus —
  * so the shingle set broadcasts and the containment probe is a map-side
  * hash lookup per corpus shingle; the only shuffle is the per-doc count
  * aggregation (map-side combined). Corpus bodies move once, in the final
  * anti-join of [[dropContaminated]].
  */
object Decontaminate {

  /** Per-corpus-doc overlap stats: (id, n_shingles, matched, overlap_ratio). */
  def overlap(corpus: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
              n: Int = 8): DataFrame = {
    // native one-pass shingle set: the declarative HOF
    // (array_distinct(TF.wordShingles)) evaluates interpreted, ~10× slower
    val shingles = graft.plans.NativeHash.shingleSet(col(textCol), n)
    val bsh = benchmark
      .select(explode(shingles).as("g"))
      .distinct()
      .withColumn("__hit", lit(1))
    val csh = corpus.select(col(idCol).as("id"), explode(shingles).as("g"))
    csh.join(broadcast(bsh), Seq("g"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_shingles"), count(col("__hit")).as("matched"))
      .withColumn("overlap_ratio",
        col("matched").cast("double") / col("n_shingles").cast("double"))
  }

  /** The decontamination MATERIALIZER: corpus rows whose shingle overlap
    * with the benchmark stays ≤ maxOverlap.
    */
  def dropContaminated(corpus: DataFrame, benchmark: DataFrame, idCol: String, textCol: String,
                       n: Int = 8, maxOverlap: Double = 0.5): DataFrame = {
    val contaminated = overlap(corpus, benchmark, idCol, textCol, n)
      .filter(col("overlap_ratio") > maxOverlap)
      .select(col("id").as(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
