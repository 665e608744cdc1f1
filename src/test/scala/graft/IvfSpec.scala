package graft

import graft.operators.Ann
import org.apache.spark.sql.functions._

class IvfSpec extends SparkSpec {

  test("ivf with nprobe=nlist equals brute force; nprobe<nlist is a subset searcher") {
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)

    val brute = Ann.bruteForceTopK(queries, emb, "vec_id", "embedding", k = 5)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    val full = Ann.ivfTopK(queries, emb, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 8)
      .select("query_id", "neighbor_id", "rank").collect().toSet
    assert(full == brute)

    val probed = Ann.ivfTopK(queries, emb, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 4)
      .collect()
    // every query still returns k results, ranked, cosine descending per query
    assert(probed.length == 15)
    val byQuery = probed.groupBy(_.getAs[Long]("query_id"))
    assert(byQuery.values.forall { rs =>
      val sorted = rs.sortBy(_.getAs[Int]("rank"))
      sorted.map(_.getAs[Double]("cosine")).toSeq.sliding(2).forall(p => p.length < 2 || p(0) >= p(1))
    })
  }

  test("centroids pinned through a parquet fixture search bit-identically to fresh training") {
    val emb = GraftSession.table(spark, sfDir, "embeddings")
    val queries = emb.filter(col("vec_id") < 3)
    val dir = java.nio.file.Files.createTempDirectory("ivf_fix").toString + "/cents.parquet"
    Ann.trainIvfCentroids(emb, "vec_id", "embedding", nlist = 8, iters = 1)
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val viaFixture = Ann.ivfTopKWithCentroids(queries, emb, spark.read.parquet(dir),
        "vec_id", "embedding", k = 5, nprobe = 3)
      .collect().map(_.toSeq).toSet
    val fresh = Ann.ivfTopK(queries, emb, "vec_id", "embedding", k = 5, nlist = 8, nprobe = 3)
      .collect().map(_.toSeq).toSet
    // float32 centroids round-trip parquet exactly — the fixture route (what
    // q_ann_ivf and its SQL oracle consume) IS the in-memory route
    assert(viaFixture == fresh)
  }
}
