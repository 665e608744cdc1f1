package graft

import graft.operators.{Caches, Dedup}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** The minhash BANDED path (the 100 TB branch) on a corpus big enough to
  * route past the broadcast probe (>1024 distinct word sets), with the
  * skew shape the single-value-band design dies on: words present in EVERY
  * document.
  *
  * Ground truth is constructive: the corpus is base/variant pairs with
  * known jaccard 14/16 = 0.875 and all cross pairs far below threshold, so
  * the expected pair set is exact without an all-pairs scan.
  */
class MinhashBandedSpec extends SparkSpec {

  /** 4600 base docs + 4600 single-word variants, every doc carrying two
    * universal words. Word blocks are disjoint across bases, so the only
    * pairs with jaccard ≥ 0.8 are (base i, variant i): |∩| = 14, |∪| = 16.
    */
  private def corpus(): DataFrame = {
    val n = 4600
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

  test("banded path (auto-selected on >1024 sets) finds exactly the constructed pairs") {
    val docs = corpus()
    val pairs = Dedup.nearDupPairs(docs, "id", "text", threshold = 0.8).collect()
    Caches.release()
    assert(pairs.length == 4600, s"expected 4600 pairs, got ${pairs.length}")
    assert(pairs.forall(r => r.getLong(1) == r.getLong(0) + 4600))
    assert(pairs.forall(r => math.abs(r.getDouble(2) - 14.0 / 16.0) < 1e-12))
  }

  test("r=2 band keys bound bucket sizes under universal-word skew; r=1 does not") {
    val docs = corpus()
    def maxBucket(bands: Int, r: Int): Long = {
      val keys = docs.select(explode(Dedup.bandKeys(
        graft.plans.NativeHash.minhashSignature(col("text"), bands * r), bands, r)).as("bk"))
      keys.groupBy("bk").count().agg(max("count")).first().getLong(0)
    }
    // same number of bands, so bucket structure is comparable; only the
    // rows-per-band differ
    val r1 = maxBucket(20, 1)
    val r2 = maxBucket(20, 2)
    info(s"max bucket: r=1 → $r1 docs, r=2 → $r2 docs (n=9200)")
    // universal words capture ~2/15 of docs per single-hash band (one
    // shared key value), r=2 squares the capture rate
    assert(r1 > 400, s"skew corpus should produce a mega-bucket under r=1, got $r1")
    assert(r2 * 3 < r1, s"r=2 buckets should shrink ≥3× vs r=1, got $r2 vs $r1")
  }

  test("banded and broadcast strategies return identical results on the same corpus") {
    // mid-size corpus, both strategies forced
    val docs = corpus().filter(col("id") % 23 === 0 || col("id") % 23 === 11)
    val viaBroadcast = Dedup.nearDupPairs(docs, "id", "text", 0.8)
      .orderBy("id_a", "id_b").collect().toSeq
    Caches.release()
    val viaBanded = Dedup.nearDupPairs(docs, "id", "text", 0.8, broadcastThreshold = 0L)
      .orderBy("id_a", "id_b").collect().toSeq
    Caches.release()
    assert(viaBroadcast == viaBanded)
    assert(viaBroadcast.nonEmpty)
  }

  test("native graft_band_keys equals the declarative HOF fold") {
    // random signatures including negative hash values and a short array
    // (the fold over a truncated final band must keep its seed semantics)
    val rnd = new scala.util.Random(13)
    val sigs = Seq.fill(300)(Seq.fill(40)(rnd.nextLong())) ++
      Seq(Seq.empty[Long], Seq.fill(7)(rnd.nextLong()))
    import spark.implicits._
    for ((bands, r) <- Seq((20, 2), (20, 1), (5, 4))) {
      val rows = sigs.toDF("sig")
        .select(Dedup.bandKeys(col("sig"), bands, r).as("native"),
          Dedup.bandKeysDeclarative(col("sig"), bands, r).as("decl"))
        .collect()
      rows.foreach(row => assert(row.getSeq[Long](0) === row.getSeq[Long](1), s"bands=$bands r=$r"))
    }
  }
}
