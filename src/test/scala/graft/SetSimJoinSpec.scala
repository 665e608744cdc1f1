package graft

import graft.operators.{Caches, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact prefix-filter set-similarity join (AllPairs/PPJoin family):
  * completeness is a theorem, so the gate here is literal equality with
  * brute force — on a corpus engineered to stress exactly the things the
  * prefix filter could get wrong (threshold-straddling jaccards, stopword
  * skew, duplicated sets).
  */
class SetSimJoinSpec extends SparkSpec {

  /** base/variant pairs with known jaccard 14/16 = 0.875 plus two
    * universal stopword-grade tokens in every doc (the skew that kills a
    * naive inverted-index self-join — rarest-first prefixes must keep
    * them out of the candidate stage).
    */
  private def corpus(n: Int): DataFrame = {
    def words(prefix: String): org.apache.spark.sql.Column = {
      val cols = Seq(lit("alpha"), lit("omega"),
        concat(lit(prefix), col("id").cast("string"))) ++
        (0 until 12).map(j => concat(lit("w"), (col("id") * 12 + lit(j)).cast("string")))
      concat_ws(" ", cols: _*)
    }
    val base = spark.range(n).select(col("id"), words("u").as("text"))
    val variant = spark.range(n)
      .select((col("id") + n).as("id"), words("x").as("text"))
    base.unionByName(variant)
  }

  test("prefix-filter join finds exactly the constructed pairs under stopword skew") {
    val pairs = Dedup.prefixFilterPairs(corpus(1500), "id", "text", tNum = 4, tDen = 5).collect()
    Caches.release()
    assert(pairs.length == 1500, s"expected 1500 pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 1500))
    assert(pairs.forall(r => math.abs(r.getDouble(2) - 14.0 / 16.0) < 1e-12))
  }

  test("equals brute-force all-pairs on a threshold-straddling random corpus") {
    // overlapping word windows from a shared vocabulary: per group of 3
    // ids — two identical 10-token docs (jaccard 1.0, the intra path) and
    // one 9-token subset (jaccard 9/10 = 0.9 with both); adjacent groups
    // overlap 8/12 ≈ 0.67 (below threshold) — pairs on BOTH sides of 0.8
    val grp = expr("id div 3")
    val nTok = when(col("id") % 3 === 2, lit(9)).otherwise(lit(10))
    val docs = spark.range(240).select(col("id"),
      concat_ws(" ", transform(sequence(lit(0), nTok - 1),
        j => concat(lit("v"), (grp * 2 + j).cast("string")))).as("text"))
    val exact = Dedup.jaccardPairs(docs, "id", "text", 0.8)
      .orderBy("id_a", "id_b").collect().toSeq
    val viaPrefix = Dedup.prefixFilterPairs(docs, "id", "text", 4, 5)
      .orderBy("id_a", "id_b").collect().toSeq
    Caches.release()
    assert(viaPrefix.nonEmpty)
    assert(viaPrefix == exact)
  }

  test("brute and prefix candidate routes produce identical rep pairs (r12 planner split)") {
    // default bruteThreshold routes these small corpora down the broadcast
    // all-pairs scan; bruteThreshold = 0 forces the prefix-filter join —
    // both are exact, so the substrate must be bit-identical either way
    // (the setGraph route-equality contract, extended to the exact family)
    for ((docs, tag) <- Seq((corpus(500), "stopword-skew"),
                            (corpus(300).filter(col("id") % 5 =!= 1), "gapped"))) {
      val brute = Dedup.prefixSub(docs, "id", "text", 4, 5)
        .repPairs.orderBy("id_a", "id_b").collect().toSeq
      Caches.release()
      val prefix = Dedup.prefixSub(docs, "id", "text", 4, 5, bruteThreshold = 0L)
        .repPairs.orderBy("id_a", "id_b").collect().toSeq
      Caches.release()
      assert(brute.nonEmpty, tag)
      assert(brute == prefix, tag)
    }
  }

  test("prefix route (forced) still finds exactly the constructed pairs") {
    val sub = Dedup.prefixSub(corpus(700), "id", "text", 4, 5, bruteThreshold = 0L)
    val cross = sub.repPairs
      .join(sub.keyed.select(col("g").as("id_a"), col("id").as("ia")), "id_a")
      .join(sub.keyed.select(col("g").as("id_b"), col("id").as("ib")), "id_b")
      .select(least(col("ia"), col("ib")).as("id_a"),
        greatest(col("ia"), col("ib")).as("id_b"))
      .collect()
    Caches.release()
    assert(cross.length == 700, s"expected 700 pairs, got ${cross.length}")
  }

  test("agrees with the minhash route pair-for-pair on a mixed corpus") {
    val docs = corpus(400).filter(col("id") % 7 =!= 3)
    val viaMinhash = Dedup.nearDupPairs(docs, "id", "text", 0.8)
      .orderBy("id_a", "id_b").collect().toSeq
    Caches.release()
    val viaPrefix = Dedup.prefixFilterPairs(docs, "id", "text", 4, 5)
      .orderBy("id_a", "id_b").collect().toSeq
    Caches.release()
    assert(viaPrefix == viaMinhash)
    assert(viaPrefix.nonEmpty)
  }
}
