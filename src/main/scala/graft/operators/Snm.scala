package graft.operators

import graft.functions.TextFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Sorted-neighborhood near-duplicate candidates (Hernández & Stolfo's
  * merge/purge method): sort the corpus by a cheap normalized key, compare
  * only records within a fixed-size sliding window of that order.
  *
  * The blocking family's third leg: hashing families (minhash bands,
  * simhash, embedding LSH) catch content-wide similarity; the sorted
  * neighborhood catches PREFIX-anchored near-dups — retitled reposts,
  * boilerplate-headed mirrors, serial-numbered variants — with a candidate
  * count that is exactly (w−1)·n by construction, never collision-bounded.
  *
  * Scale shape: the global order comes from [[Scale.globalRowNumber]]
  * (range shuffle + partition-local numbering — no single-partition
  * window); the window expands to w−1 offset rows per record (slim
  * (id, rank) pairs) and closes with ONE equi-join on rank — a range-free
  * hash join. Text joins back only for the (w−1)·n candidates, and the
  * exact word-set jaccard verify prunes them. Everything is linear in n.
  */
object Snm {

  /** Normalized sort key: first `keyLen` chars of the whitespace-collapsed
    * lowercased text — the cheap surrogate the method sorts on.
    */
  def snmKey(text: org.apache.spark.sql.Column, keyLen: Int): org.apache.spark.sql.Column =
    substring(regexp_replace(lower(trim(text)), "\\s+", " "), 1, keyLen)

  /** Verified near-dup pairs from one sorted-neighborhood pass:
    * (id_a, id_b, jaccard) for window-adjacent pairs with word-set
    * jaccard ≥ `minJaccard`; id_a is the window-earlier record.
    */
  def snmPairs(docs: DataFrame, idCol: String, textCol: String,
               window: Int, minJaccard: Double, keyLen: Int = 24): DataFrame = {
    require(window >= 2, "window must cover at least one neighbor")
    val keyed = docs.select(col(idCol).as("doc_id"), col(textCol).as("text"))
      .withColumn("k", snmKey(col("text"), keyLen))
    val rn = Scale.globalRowNumber(keyed, Seq("k", "doc_id"), "rn")
      .select("doc_id", "text", "rn")
    val probes = rn
      .withColumn("off", explode(array((1 until window).map(lit): _*)))
      .select(col("doc_id").as("id_a"), TextFunctions.wordSet(col("text")).as("wa"),
        (col("rn") + col("off")).as("rn"))
    val cand = probes.join(
      rn.select(col("doc_id").as("id_b"), TextFunctions.wordSet(col("text")).as("wb"), col("rn")),
      "rn")
    cand
      .withColumn("jaccard",
        size(array_intersect(col("wa"), col("wb"))).cast("double") /
          size(array_union(col("wa"), col("wb"))).cast("double"))
      .filter(col("jaccard") >= minJaccard)
      .select("id_a", "id_b", "jaccard")
  }
}
