package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Document deduplication family (SURVEY.md §2.3): exact, MinHash+LSH,
  * SimHash. Each stage is shuffle-bounded — no all-pairs scan ever
  * materializes; candidates come from hash-bucket joins.
  */
object Dedup {

  /** Exact duplicate groups by content fingerprint. One groupBy shuffle with
    * map-side combine; at 100 TB the md5 keys shuffle, not the documents.
    */
  def exactGroups(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    docs
      .select(col(idCol), TextFunctions.contentFingerprint(col(textCol)).as("fingerprint"))
      .groupBy("fingerprint")
      .agg(
        count(lit(1)).as("n_docs"),
        min(col(idCol)).as("keep_id"),
        array_join(sort_array(collect_list(col(idCol).cast("string"))), ",").as("doc_ids")
      )

  /** MinHash-LSH candidate pairs (id_a < id_b): docs sharing ≥1 of the k
    * minhash values. k single-hash bands maximize recall (P[miss] =
    * (1−j)^k — astronomically small for near-dups); precision is restored by
    * the exact-jaccard verify in [[nearDupPairs]].
    *
    * Scale: explode k values per doc → groupBy-free self-join on
    * (band, value) buckets. Boilerplate-heavy buckets are capped upstream by
    * AQE skew handling; the verify join only ever sees candidate pairs.
    */
  def minhashCandidates(docs: DataFrame, idCol: String, textCol: String, k: Int = 32): DataFrame = {
    val sigs = docs.select(
      col(idCol).as("id"),
      posexplode(TextFunctions.minhashSignature(col(textCol), k)).as(Seq("band", "mh"))
    )
    sigs.as("a")
      .join(sigs.as("b"), col("a.band") === col("b.band") && col("a.mh") === col("b.mh") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
  }

  /** Near-duplicate pairs: LSH candidates filtered by exact word-set jaccard
    * ≥ threshold. Output is verifiable against an all-pairs oracle because
    * the LSH stage (k=32 single-hash bands) has ~zero false-negative mass at
    * useful thresholds.
    */
  def nearDupPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double, k: Int = 32): DataFrame = {
    val words = docs.select(col(idCol).as("id"), TextFunctions.wordSet(col(textCol)).as("words"))
    minhashCandidates(docs, idCol, textCol, k)
      .join(words.withColumnsRenamed(Map("id" -> "id_a", "words" -> "words_a")), "id_a")
      .join(words.withColumnsRenamed(Map("id" -> "id_b", "words" -> "words_b")), "id_b")
      .withColumn("jaccard",
        size(array_intersect(col("words_a"), col("words_b"))).cast("double") /
          size(array_union(col("words_a"), col("words_b"))).cast("double"))
      .filter(col("jaccard") >= threshold)
      .select("id_a", "id_b", "jaccard")
  }

  /** SimHash near-dup candidates: 64-bit fingerprints bucketed by 16-bit
    * quarters (any hamming-≤3 pair shares ≥1 identical quarter — pigeonhole),
    * verified by exact hamming distance.
    */
  def simhashPairs(docs: DataFrame, idCol: String, textCol: String, maxHamming: Int = 3): DataFrame = {
    val fp = docs.select(col(idCol).as("id"), TextFunctions.simhash64(col(textCol)).as("sim"))
    val quarters = fp.select(col("id"), col("sim"),
      posexplode(transform(sequence(lit(0), lit(3)), q =>
        call_function("shiftright", col("sim"), q * 16).bitwiseAND(lit(0xFFFFL)))).as(Seq("q", "chunk")))
    quarters.as("a")
      .join(quarters.as("b"),
        col("a.q") === col("b.q") && col("a.chunk") === col("b.chunk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        bit_count(col("a.sim").bitwiseXOR(col("b.sim"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Exact all-pairs n-gram/word jaccard over a bounded id range (the
    * correctness baseline the LSH paths approximate).
    */
  def jaccardPairs(docs: DataFrame, idCol: String, textCol: String,
                   threshold: Double): DataFrame = {
    val words = docs.select(col(idCol).as("id"), TextFunctions.wordSet(col(textCol)).as("words"))
    words.as("a").join(words.as("b"), col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"),
        (size(array_intersect(col("a.words"), col("b.words"))).cast("double") /
          size(array_union(col("a.words"), col("b.words"))).cast("double")).as("jaccard"))
      .filter(col("jaccard") >= threshold)
  }
}
