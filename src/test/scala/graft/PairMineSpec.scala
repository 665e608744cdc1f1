package graft

import graft.operators.PairMine
import graft.functions.Sampling
import org.apache.spark.sql.functions._

/** Contrastive pair mining (`PairMine`): positives are exactly the
  * verified near-dup pairs, negatives follow the hash-bucket pairing with
  * no overlap, every doc is in at most one negative pair, and the output
  * is canonical (id_a < id_b, unique pairs).
  */
class PairMineSpec extends SparkSpec {
  import spark.implicits._

  // 3 exact-duplicate pairs planted among distinct filler docs
  private val docs: Seq[(Long, String)] = {
    val filler = (0 until 14).map(i =>
      (100L + i) -> s"completely distinct filler body number $i with words ${('a' + i % 26).toChar} ${i * 37} ${i * 91}")
    val dups = Seq(
      1L -> "shared near duplicate content about spark partitions and shuffles",
      2L -> "shared near duplicate content about spark partitions and shuffles",
      3L -> "another pair of twin documents speaking of broadcast joins here",
      4L -> "another pair of twin documents speaking of broadcast joins here")
    dups ++ filler
  }

  private def run(negBuckets: Int = 4) =
    PairMine.contrastivePairs(docs.toDF("doc_id", "text"), "doc_id", "text",
      theta = 0.8, negBuckets = negBuckets)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))

  test("positives are exactly the planted near-dup pairs, label 1") {
    val pos = run().filter(_._3 == 1).map(p => (p._1, p._2)).toSet
    assert(pos === Set((1L, 2L), (3L, 4L)))
  }

  test("negatives follow the md5-bucket consecutive pairing, disjoint from positives") {
    val nb = 4
    val got = run(nb)
    val neg = got.filter(_._3 == 0).map(p => (p._1, p._2)).toSet
    // driver model of the bucket pairing
    val buckets = docs.map(_._1).map { id =>
      val b = spark.range(1).select(Sampling.md5Bucket(lit(id), nb)).head.getInt(0)
      id -> b
    }.groupBy(_._2).view.mapValues(_.map(_._1).sorted).toMap
    val expected = buckets.values.flatMap(ids =>
      ids.grouped(2).collect { case Seq(a, b) => (a, b) }).toSet -- Set((1L, 2L), (3L, 4L))
    assert(neg === expected)
    assert(neg.intersect(Set((1L, 2L), (3L, 4L))).isEmpty)
  }

  test("canonical output: id_a < id_b, unique pairs, each doc in at most one negative") {
    val got = run()
    assert(got.forall(p => p._1 < p._2))
    assert(got.map(p => (p._1, p._2)).distinct.length == got.length)
    val negIds = got.filter(_._3 == 0).flatMap(p => Seq(p._1, p._2))
    assert(negIds.distinct.length == negIds.length)
  }
}
