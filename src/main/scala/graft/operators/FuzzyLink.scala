package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Fuzzy record linkage by deletion-neighborhood blocking — the
  * SymSpell / FastSS construction (Schulz & Mihov 2002's universal
  * Levenshtein neighborhood, restricted to deletions), distributed as
  * ONE equi-join.
  *
  * The reference's merge flow keys records on exact identifiers
  * (`DataSetCollection.php:26-63` dedupes on equality); real EDI feeds
  * arrive with typo'd identifiers, and the classic fix — block on
  * q-grams, then verify with edit distance — collapses to all-pairs on
  * ID-like strings that share a long common prefix (every
  * `Customer#0000…` shares almost every 3-gram). Deletion-neighborhood
  * blocking has no such failure mode: two strings are within Levenshtein
  * distance 1 ONLY IF their {identity + single-character-deletion}
  * variant sets intersect, so the candidate generator is an equi-join on
  * variant strings — a hash shuffle, never a cross product.
  *
  * Scale shape: each side materializes (len+1) variants per record —
  * LINEAR blowup (~19× for 18-char keys), all slim (id, variant) rows.
  * The join is a plain shuffle hash join on the variant string; fan-in
  * per variant is bounded by how many records share a one-deletion
  * neighborhood (single digits for ID-like keys), so no skew handling is
  * needed. At 10¹⁰ masters the variant table is the SymSpell index as a
  * bucketed table: build once, bucket by variant, and every incoming
  * probe batch is a co-located join — the same incremental shape as
  * [[Dedup.probeSurvivors]]. The levenshtein verify (codegen'd built-in)
  * runs only on candidates, and `distinct()` before it keeps the verify
  * stream at one row per (probe, master) pair.
  */
object FuzzyLink {

  /** Identity + every single-character-deletion variant, deduplicated
    * (runs of repeated characters make duplicate variants). Empty
    * strings get just the identity variant — Spark's `sequence(1, 0)`
    * would DESCEND, not produce an empty array.
    */
  def deletionVariants(s: Column): Column = {
    val dels = transform(sequence(lit(1), length(s)),
      i => concat(s.substr(lit(1), i - lit(1)), s.substr(i + lit(1), length(s))))
    array_distinct(when(length(s) <= 0, array(s)).otherwise(concat(array(s), dels)))
  }

  /** All (probe, master) pairs within Levenshtein distance 1, found via
    * the variant equi-join; exact (the deletion neighborhood is a
    * superset generator for distance ≤ 1, and the verify prunes it).
    */
  def linkByDeletion(master: DataFrame, masterId: String, masterName: String,
                     probe: DataFrame, probeId: String, probeName: String): DataFrame = {
    val mv = master
      .select(col(masterId).as("master_id"), col(masterName).as("master_name"))
      .withColumn("variant", explode(deletionVariants(col("master_name"))))
    val pv = probe
      .select(col(probeId).as("probe_id"), col(probeName).as("probe_name"))
      .withColumn("variant", explode(deletionVariants(col("probe_name"))))
    // Shuffle-hash on the variant key, probe side as build: the static
    // planner underestimates the post-explode master side (~19× its scan)
    // and broadcasts it — a linear-growth broadcast that dies at 10¹⁰
    // masters. The probe batch is the structurally small side here.
    pv.hint("shuffle_hash").join(mv, Seq("variant"))
      .select("probe_id", "probe_name", "master_id", "master_name")
      .distinct()
      .withColumn("distance", levenshtein(col("probe_name"), col("master_name")))
      .filter(col("distance") <= 1)
  }

  /** Linkage report: per probe, the best master match (min distance,
    * master_id tie-break — one struct-min, no window shuffle) plus the
    * candidate count, the ambiguity signal a downstream merge needs.
    */
  def linkReport(master: DataFrame, masterId: String, masterName: String,
                 probe: DataFrame, probeId: String, probeName: String): DataFrame =
    linkByDeletion(master, masterId, masterName, probe, probeId, probeName)
      .groupBy("probe_id", "probe_name")
      .agg(min(struct(col("distance"), col("master_id"), col("master_name"))).as("best"),
           count(lit(1)).as("n_cand"))
      .select(col("probe_id"), col("probe_name"),
        col("best.master_id").as("match_id"),
        col("best.master_name").as("match_name"),
        col("best.distance").as("distance"),
        col("n_cand"))
}
