package graft

import org.apache.spark.sql.functions._

/** Round-8 operator scale points (`runMain graft.R8ScaleProbe`): min-of-3
  * wall-clock at sf0.1 vs the deterministic ×10 corpus for the four new
  * operator families — winnowing fingerprints (+ pair index), full-corpus
  * k-means (train+assign, the registry shape), CDC chunking (+ dedup
  * accounting), and fixed-point PageRank over the order-flow graph.
  * Per-replica token/key namespaces keep candidate structure linear, so a
  * ratio ≲ 10× for 10× data means the operator scales at least linearly.
  */
object R8ScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    def best(label: String)(body: => Long): Unit = {
      var min = Double.MaxValue
      var rows = 0L
      for (_ <- 1 to 3) {
        val t0 = System.nanoTime()
        rows = body
        graft.operators.Caches.release()
        min = math.min(min, (System.nanoTime() - t0) / 1e9)
      }
      println(f"[r8-scale] $label: $min%.2f s rows=$rows")
    }
    for (sf <- Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1")) {
      GraftSession.autoSizeShuffle(spark, sf)
      println(s"[r8-scale] == $sf ==")
      def docs = spark.read.parquet(s"$sf/documents.parquet")
      def emb = spark.read.parquet(s"$sf/embeddings.parquet")
      best(s"winnow_fingerprints") {
        graft.operators.Winnow.fingerprints(docs, "doc_id", "text", 4, 4).count()
      }
      best(s"winnow_pairs") {
        graft.operators.Winnow.candidatePairs(docs, "doc_id", "text", 4, 4, 1000, 2).count()
      }
      best(s"kmeans_cluster_k8_i2") {
        graft.operators.KMeans.cluster(emb, "vec_id", "embedding", 8, 2).count()
      }
      best(s"cdc_chunks") {
        graft.operators.Cdc.chunks(docs, "doc_id", "text").count()
      }
      best(s"cdc_stats") {
        graft.operators.Cdc.dedupStats(docs, "doc_id", "text").count()
      }
      best(s"pagerank_i3") {
        val o = spark.read.parquet(s"$sf/orders.parquet")
        val l = spark.read.parquet(s"$sf/lineitem.parquet")
        val e = o.join(l, col("l_orderkey") === col("o_orderkey"))
          .select(concat(lit("c"), col("o_custkey").cast("string")).as("c"),
            concat(lit("s"), col("l_suppkey").cast("string")).as("ss"))
          .distinct()
        val sym = e.select(col("c").as("src"), col("ss").as("dst"))
          .union(e.select(col("ss").as("src"), col("c").as("dst")))
        graft.operators.Graph.pageRank(sym, "src", "dst", 3).count()
      }
    }
    spark.stop()
  }
}
