package graft

import graft.operators.{Caches, Dedup}
import graft.queries.{LlmQueries, SourceQueries}
import org.apache.spark.sql.functions._

/** Blocking-quality confusion (q_simhash_eval) and the k-anonymity audit
  * (q_kanon): identities that must hold by construction, plus driver-side
  * reference models on the real tables.
  */
class EvalAuditSpec extends SparkSpec {
  import spark.implicits._

  test("simhash eval: identical docs are tp; confusion identities hold on the real table") {
    val out = LlmQueries.qSimhashEval(spark, sfDir).first()
    Caches.release()
    val (tp, fp, fn) = (out.getLong(0), out.getLong(1), out.getLong(2))
    val truth = Dedup.prefixFilterPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 4, 5).count()
    Caches.release()
    val cand = Dedup.simhashPairs(
      spark.read.parquet(s"$sfDir/documents.parquet"), "doc_id", "text", 3).count()
    Caches.release()
    assert(tp + fn == truth, "tp + fn must equal |truth|")
    assert(tp + fp == cand, "tp + fp must equal |candidates|")
    assert(out.getDouble(3) == tp.toDouble / (tp + fp))
    assert(out.getDouble(4) == tp.toDouble / (tp + fn))
  }

  test("simhash eval: a corpus of exact duplicates scores perfect precision and recall") {
    // identical texts → simhash hamming 0 AND jaccard 1: cand == truth
    val docs = spark.range(40)
      .select(col("id").as("doc_id"),
        concat(lit("alpha beta gamma delta epsilon zeta"),
          when(col("id") % 2 === 0, lit("")).otherwise(lit(" eta theta iota kappa"))).as("text"))
    val cand = Dedup.simhashPairs(docs, "doc_id", "text", 3).select("id_a", "id_b")
    val truth = Dedup.prefixFilterPairs(docs, "doc_id", "text", 4, 5).select("id_a", "id_b")
    val c = cand.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val t = truth.collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    Caches.release()
    // two 20-doc duplicate groups; cross-group jaccard 6/10 < 0.8 and the
    // two fingerprints differ in >3 bits unless degenerate
    assert(t == c)
    assert(t.size == 2 * 20 * 19 / 2)
  }

  test("kanon: class accounting matches a driver-side model of the same quasi-ids") {
    val rows = SourceQueries.qKanon(spark, sfDir).collect()
      .map(r => r.getInt(0) -> (r.getLong(1), r.getLong(2))).toMap
    Caches.release()
    val sizes = spark.read.parquet(s"$sfDir/customer.parquet")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000.0).cast("long"))
      .count().collect().map(_.getLong(3))
    for (k <- Seq(2, 5, 10)) {
      val below = sizes.filter(_ < k)
      assert(rows(k) == (below.length.toLong, below.sum), s"k=$k")
    }
    // monotone: raising k can only grow the at-risk sets
    assert(rows(2)._1 <= rows(5)._1 && rows(5)._1 <= rows(10)._1)
    assert(rows(2)._2 <= rows(5)._2 && rows(5)._2 <= rows(10)._2)
  }

  test("delete propagation: cascade counts reconcile with a driver model of the hash sample") {
    val rep = graft.queries.SourceQueries.qDeletePropagation(spark, sfDir).collect()
      .map(r => r.getString(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    Caches.release()
    assert(rep.keySet == Set("customer", "orders", "lineitem", "events"))
    rep.foreach { case (t, (n, d, ppm)) =>
      assert(d <= n, s"$t deletes exceed rows")
      assert(ppm == d * 1000000L / n, s"$t ppm must be the exact division")
    }
    val md = java.security.MessageDigest.getInstance("MD5")
    def hit(k: Long): Boolean = {
      val b = md.digest(s"del:$k".getBytes("UTF-8"))
      val v = (0 until 8).map(i => BigInt(b(8 + i) & 0xff) << (8 * i)).sum
      v % 100 == 0
    }
    val custkeys = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey").collect().map(_.getLong(0))
    assert(rep("customer")._2 == custkeys.count(hit).toLong)
    val orders = spark.read.parquet(s"$sfDir/orders.parquet")
      .select("o_orderkey", "o_custkey").collect().map(r => (r.getLong(0), r.getLong(1)))
    val deadOrders = orders.filter(o => hit(o._2)).map(_._1).toSet
    assert(rep("orders")._2 == deadOrders.size.toLong)
    // the cascade: lineitems die with their ORDER, never by direct key hash
    val liDead = spark.read.parquet(s"$sfDir/lineitem.parquet")
      .select("l_orderkey").collect().map(_.getLong(0)).count(deadOrders.contains)
    assert(rep("lineitem")._2 == liDead.toLong)
  }
}
