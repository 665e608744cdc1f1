package graft

import graft.operators.Dedup

/** Near-dup cluster-size histogram
  * ([[graft.operators.Dedup.clusterSizeHistogram]]): planted clusters of
  * known sizes land in the right power-of-two buckets; shares sum to 1.
  */
class ClusterSizesSpec extends SparkSpec {
  import spark.implicits._

  test("planted clusters of size 2, 3, and 5 plus singletons bucket correctly") {
    def copies(base: Long, text: String, n: Int) =
      (0 until n).map(i => (base + i, text))
    val df = (copies(10L, "alpha beta gamma delta", 2) ++
      copies(20L, "epsilon zeta eta theta", 3) ++
      copies(30L, "iota kappa lambda mu", 5) ++
      Seq((40L, "nu xi omicron pi"), (41L, "rho sigma tau upsilon")))
      .toDF("doc_id", "text")
    val got = Dedup.clusterSizeHistogram(df, "doc_id", "text", threshold = 0.8)
      .orderBy("bucket").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3))).toSeq
    // sizes: 2 → bucket 2; 3 → bucket 2; 5 → bucket 3; 2 singletons → bucket 1
    assert(got === Seq(
      (1, 2L, 2L, 2.0 / 12.0),
      (2, 2L, 5L, 5.0 / 12.0),
      (3, 1L, 5L, 5.0 / 12.0)))
    assert(math.abs(got.map(_._4).sum - 1.0) < 1e-12)
  }

  test("real documents: docs are fully accounted for and consistent with the pair graph") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val total = docs.count()
    val rows = graft.queries.LlmQueries.qDedupClusterSizes(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
    assert(rows.map(_._3).sum === total)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-9)
    // driver-side union-find over the verified pairs must give the same histogram
    val pairs = Dedup.nearDupPairs(docs, "doc_id", "text", 0.8).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { val p = parent.getOrElse(x, x); if (p == x) x else { val r = find(p); parent(x) = r; r } }
    pairs.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b)); if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val touched = pairs.flatMap(p => Seq(p._1, p._2)).distinct
    val sizes = touched.groupBy(find).map(_._2.length.toLong).toSeq
    val model = (sizes.groupBy(s => java.lang.Long.toBinaryString(s).length)
      .map { case (b, ss) => (b, ss.size.toLong, ss.sum) }.toSeq :+
      ((1, total - touched.length, total - touched.length)))
      .sortBy(_._1).map { case (b, nc, nd) => (b, nc, nd, nd.toDouble / total) }
    assert(rows.toSeq === model)
  }
}
