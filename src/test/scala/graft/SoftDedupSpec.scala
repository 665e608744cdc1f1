package graft

import graft.operators.Dedup
import org.apache.spark.sql.functions._

/** clusterAssign + its consumers (q_soft_dedup / q_split_leakage) and the
  * batching/crawl reports (q_pad_waste / q_url_canon).
  */
class SoftDedupSpec extends SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  /** Driver reference: union-find over exact all-pairs word-set jaccard. */
  private def refClusters(rows: Seq[(Long, String)], t: Double): Map[Long, Long] = {
    def ws(s: String) = s.trim.toLowerCase.split("\\s+").toSet
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = { var r = x; while (parent.getOrElse(r, r) != r) r = parent(r); r }
    def union(a: Long, b: Long): Unit = {
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) { if (ra < rb) parent(rb) = ra else parent(ra) = rb }
    }
    for (Seq((ia, ta), (ib, tb)) <- rows.combinations(2)) {
      val (wa, wb) = (ws(ta), ws(tb))
      val j = wa.intersect(wb).size.toDouble / wa.union(wb).size
      if (j >= t) union(ia, ib)
    }
    rows.map { case (id, _) => id -> find(id) }.toMap
  }

  test("clusterAssign matches the driver union-find on planted chain + copies + singleton") {
    // a–b–c is a jaccard chain (a~b and b~c similar, a~c not); d,e identical
    // copies; f isolated — the label must be the COMPONENT min, transitively
    val rows = Seq(
      1L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10",
      2L -> "w1 w2 w3 w4 w5 w6 w7 w8 w9 x1",
      3L -> "w1 w2 w3 w4 w5 w6 w7 w8 x1 x2",
      4L -> "a b c d e",
      5L -> "a b c d e",
      6L -> "z1 z2 z3 z4 z5")
    val got = Dedup.clusterAssign(docs(rows: _*), "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ref = refClusters(rows, 0.8)
    val sizes = ref.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    assert(got == rows.map { case (id, _) => (id, ref(id), sizes(ref(id))) }.toSet)
    Dedup.releaseCaches()
  }

  test("clusterAssign matches the driver model on the real sf0.001 corpus") {
    val d = spark.read.parquet(s"$sfDir/documents.parquet")
    val rows = d.select(col("doc_id"), col("text")).collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val ref = refClusters(rows, 0.8)
    val sizes = ref.values.groupBy(identity).map { case (c, xs) => c -> xs.size.toLong }
    val got = Dedup.clusterAssign(d, "doc_id", "text", 4, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == rows.map { case (id, _) => (id, ref(id), sizes(ref(id))) }.toSet)
    Dedup.releaseCaches()
  }

  test("q_soft_dedup: cluster mass sums to one doc-equivalent per cluster (ppm floor)") {
    val out = graft.queries.LlmQueries.qSoftDedup(spark, sfDir)
    val rows = out.collect()
    assert(rows.nonEmpty)
    // every doc's weight is exactly floor(1e6 / size); per-cluster weight
    // mass is then within one ulp-of-ppm of 1e6 (floor loses < size ppm)
    rows.foreach { r =>
      val (sz, w) = (r.getLong(2), r.getLong(3))
      assert(w == 1000000L / sz)
    }
    val byCluster = rows.groupBy(_.getLong(1))
    byCluster.foreach { case (_, xs) =>
      val sz = xs.head.getLong(2)
      assert(xs.length.toLong == sz)
      val mass = xs.map(_.getLong(3)).sum
      assert(mass <= 1000000L && mass > 1000000L - sz)
    }
    Dedup.releaseCaches()
  }

  test("q_split_leakage: cluster policy leaks ZERO pairs; split sizes partition the corpus") {
    val total = spark.read.parquet(s"$sfDir/documents.parquet").count()
    val out = graft.queries.LlmQueries.qSplitLeakage(spark, sfDir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    val (ctr, cva, cte, ccross) = out("cluster_hash")
    val (dtr, dva, dte, _) = out("doc_hash")
    assert(ccross == 0L, "cluster-hash split must never strand a near-dup pair")
    assert(ctr + cva + cte == total && dtr + dva + dte == total)
    Dedup.releaseCaches()
  }

  test("doc-hash policy CAN strand a planted near-dup pair (the leak the cluster policy closes)") {
    // ids chosen so md5(id) buckets land in different splits (20 → train,
    // 9 → test under the 80/10 split — verified below, not assumed)
    val f = graft.functions.Sampling
    val b = Seq(9L, 20L).toDF("id")
      .select(col("id"), f.split(col("id"), 80, 10).as("s")).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(b(9L) != b(20L), s"fixture ids no longer straddle: $b")
    val d = docs(9L -> "p q r s t u v w x y", 20L -> "p q r s t u v w x y")
    val cl = Dedup.clusterAssign(d, "doc_id", "text", 4, 5)
    // identical docs: one cluster, size 2 — under doc-hash they'd split
    assert(cl.select("cluster_id").distinct().count() == 1)
    Dedup.releaseCaches()
  }

  test("q_effective_tokens: retention in (0,1], weighted mass bounded by raw, singleton identity") {
    val rows = graft.queries.LlmQueries.qEffectiveTokens(spark, sfDir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val raw = r.getLong(2)
      // r12: the gated column is BIGINT both sides (the q_more_like_this
      // recipe — un-cast HUGEINT/decimal128 was the r11 driver-red cause)
      val eff = r.getLong(3)
      val ret = r.getDouble(4)
      assert(eff <= raw * 1000000L)
      assert(ret > 0.0 && ret <= 1.0)
    }
    // a corpus with NO near-dups retains everything: weights are all 1e6
    import spark.implicits._
    val singletons = Seq((1L, "a b c", "s1"), (2L, "d e f", "s1"), (3L, "g h i", "s2"))
      .toDF("doc_id", "text", "source")
    val cl = Dedup.clusterAssign(singletons, "doc_id", "text", 4, 5)
    assert(cl.filter(col("cluster_size") =!= 1L).count() == 0)
    Dedup.releaseCaches()
  }

  test("q_dedup_keep_best: winner beats or ties every clustermate; one winner per cluster") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
    val cl = Dedup.clusterAssign(docs, "doc_id", "text", 4, 5)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val quality = docs.select(col("doc_id"),
        graft.functions.TextFunctions.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val winners = graft.queries.LlmQueries.qDedupKeepBest(spark, sfDir).collect()
    // exactly one winner per cluster, and it is the (quality desc, id asc) argmax
    assert(winners.map(_.getLong(1)).distinct.length == winners.length)
    assert(winners.map(_.getLong(1)).toSet == cl.values.toSet)
    winners.foreach { w =>
      val (id, cid, q) = (w.getLong(0), w.getLong(1), w.getDouble(6))
      assert(quality(id) == q)
      cl.collect { case (m, c) if c == cid => m }.foreach { m =>
        assert(quality(m) < q || (quality(m) == q && m >= id),
          s"member $m (q=${quality(m)}) beats winner $id (q=$q) in cluster $cid")
      }
    }
    Dedup.releaseCaches()
  }

  test("q_pad_waste: caps are the tightest enclosing power of two; waste accounting closes") {
    val out = graft.queries.LlmQueries.qPadWaste(spark, sfDir).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val (cap, n, tok, waste) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      assert((cap & (cap - 1)) == 0L, s"cap $cap not a power of two")
      assert(waste == cap * n - tok && waste >= 0)
      // tokens all fit in (cap/2, cap]: mean token len per bucket > cap/2
      assert(tok > cap / 2 * n && tok <= cap * n)
    }
    val maxpadTotal = out.map(_.getLong(4)).sum
    val padTotal = out.map(_.getLong(3)).sum
    assert(maxpadTotal >= padTotal, "bucketing can only reduce padding")
  }

  test("padding cap closed form on planted lengths") {
    val d = Seq(1L, 2L, 3L, 4L, 5L, 17L, 64L, 65L).toDF("len")
      .select(col("len"),
        when(col("len") <= 1, lit(1L))
          .otherwise(expr("shiftleft(CAST(1 AS BIGINT), length(bin(len - 1)))")).as("cap"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(d == Map(1L -> 1L, 2L -> 2L, 3L -> 4L, 4L -> 4L, 5L -> 8L,
      17L -> 32L, 64L -> 64L, 65L -> 128L))
  }
}
