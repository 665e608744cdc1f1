package graft

import graft.operators.{Caches, Containment, Dedup}
import org.apache.spark.sql.functions._

/** Directional containment: truncation detection jaccard can't see, the
  * dfCap recall trade, the one-pass materializer's survivor order, and
  * partition invariance.
  */
class ContainmentSpec extends SparkSpec {
  import spark.implicits._

  private def words(prefix: String, n: Int): Seq[String] =
    (0 until n).map(i => s"$prefix$i")

  test("a truncated copy is found at containment 1.0 where jaccard stays under threshold") {
    val big = words("w", 40)            // 36 distinct 5-gram shingles
    val small = big.take(12)            // 8 shingles, all contained in big's
    val docs = Seq((1L, big.mkString(" ")), (2L, small.mkString(" "))).toDF("doc_id", "text")
    val pairs = Containment.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(5))).toSeq
    // only the small→big direction clears 0.8: containment(2→1) = 8/8 = 1.0,
    // containment(1→2) = 8/36
    assert(pairs == Seq((2L, 1L, 1.0)))
    // the symmetric near-dup family does NOT pair them (jaccard = 8/36)
    val nd = Dedup.nearDupPairs(docs, "doc_id", "text", threshold = 0.8)
    assert(nd.count() == 0L)
    Caches.release()
  }

  test("dfCap recall trade: pairs sharing only capped shingles are missed, verify stays exact") {
    // three docs share ONE ubiquitous boilerplate line (its shingles have
    // df=3); doc pairs share nothing else
    val boiler = words("b", 8).mkString(" ") // 4 shingles at df=3
    val docs = Seq(
      (1L, boiler + " " + words("x", 8).mkString(" ")),
      (2L, boiler + " " + words("y", 8).mkString(" ")),
      (3L, boiler)).toDF("doc_id", "text")
    // uncapped: doc 3 (the pure boilerplate) is fully contained in 1 and 2
    val full = Containment.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
      .filter(col("src") === 3).select("dst").as[Long].collect().toSeq.sorted
    assert(full == Seq(1L, 2L))
    Caches.release()
    // dfCap=2 removes the shared shingles from candidate generation — the
    // only witnesses — so the pair set is empty (the documented trade)
    val capped = Containment.containmentPairs(docs, "doc_id", "text", threshold = 0.8,
      dfCap = 2)
    assert(capped.count() == 0L)
    Caches.release()
  }

  test("dropContained: chains keep only the maximal doc; equal-size ties keep the lower id") {
    val c = words("c", 30)
    val docs = Seq(
      (10L, c.take(10).mkString(" ")),  // ⊂ 11 ⊂ 12
      (11L, c.take(20).mkString(" ")),
      (12L, c.mkString(" ")),
      (20L, words("d", 10).mkString(" ")),   // equal-size mutual pair
      (21L, words("d", 10).mkString(" ")),
      (30L, words("e", 10).mkString(" ")))   // unrelated survivor
      .toDF("doc_id", "text")
    val kept = Containment.dropContained(docs, "doc_id", "text", threshold = 0.8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    assert(kept == Seq(12L, 20L, 30L))
    Caches.release()
  }

  test("incremental probe: batch survivors equal the pairs-derived reference") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 300).select("doc_id", "text")
    val corpus = docs.filter(col("doc_id") % 3 =!= 0)
    val batch = docs.filter(col("doc_id") % 3 === 0)
    val survivors = Containment.probeNotContained(corpus, batch, "doc_id", "text",
        threshold = 0.8)
      .select("doc_id").as[Long].collect().toSeq.sorted
    Caches.release()
    // reference: the full pair scan over the union, keeping batch docs with
    // no batch→corpus containment edge
    val pairs = Containment.containmentPairs(docs, "doc_id", "text", threshold = 0.8)
      .filter(col("src") % 3 === 0 && col("dst") % 3 =!= 0)
      .select("src").as[Long].collect().toSet
    Caches.release()
    val expected = batch.select("doc_id").as[Long].collect().toSeq
      .filterNot(pairs).sorted
    assert(survivors == expected && survivors.nonEmpty)
    // a batch doc contained only in ANOTHER BATCH doc is not rejected
    // (ingest never tests batch-vs-batch) — implied by the reference filter
  }

  test("pairs are partition-invariant on the real documents table") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .filter(col("doc_id") < 200).select("doc_id", "text")
    def run(d: org.apache.spark.sql.DataFrame) =
      Containment.containmentPairs(d, "doc_id", "text", threshold = 0.8)
        .orderBy("src", "dst").collect().toSeq
    val once = run(docs)
    Caches.release()
    val wide = run(docs.repartition(13))
    Caches.release()
    assert(once == wide && once.nonEmpty)
  }
}
