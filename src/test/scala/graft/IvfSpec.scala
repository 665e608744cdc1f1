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
}
