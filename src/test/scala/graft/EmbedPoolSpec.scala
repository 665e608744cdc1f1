package graft

import graft.operators.Embed
import org.apache.spark.sql.functions._

/** Embedding mean-pool: hand-computed means, partition invariance (the
  * point of the fixed-point cell sums), and ragged-input semantics.
  */
class EmbedPoolSpec extends SparkSpec {
  import spark.implicits._

  test("mean-pool matches hand-computed elementwise means") {
    val df = Seq(
      (1L, Array(1.0f, 2.0f)),
      (1L, Array(3.0f, 6.0f)),
      (2L, Array(-1.5f, 0.5f))).toDF("g", "vec")
    val got = Embed.meanPool(df, "g", "vec").orderBy("g")
      .as[(Long, Seq[Double])].collect().toSeq
    assert(got == Seq((1L, Seq(2.0, 4.0)), (2L, Seq(-1.5, 0.5))))
  }

  test("pooled means are partition-invariant (integer cell sums)") {
    // values with awkward float expansions — a double-sum formulation would
    // give order-dependent last ulps; the micro-unit quantization must not
    val df = (0 until 500).map(i =>
      (i % 7L, Array.tabulate(16)(j => ((i * 31 + j) % 997) / 997.0f - 0.5f)))
      .toDF("g", "vec")
    val once = Embed.meanPool(df, "g", "vec").orderBy("g").collect().toSeq
    val wide = Embed.meanPool(df.repartition(13), "g", "vec").orderBy("g").collect().toSeq
    assert(once == wide)
  }

  test("ragged vectors: each position averages over the vectors that have it") {
    val df = Seq(
      (1L, Array(2.0f, 4.0f, 8.0f)),
      (1L, Array(4.0f))).toDF("g", "vec")
    val got = Embed.meanPool(df, "g", "vec").orderBy("g")
      .as[(Long, Seq[Double])].collect().toSeq
    assert(got == Seq((1L, Seq(3.0, 4.0, 8.0))))
  }

  test("the real embeddings table pools to one row per group, dim preserved") {
    val emb = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .withColumn("grp", expr("vec_id DIV 10"))
    val pooled = Embed.meanPool(emb, "grp", "embedding")
    val nGroups = emb.select("grp").distinct().count()
    assert(pooled.count() == nGroups)
    assert(pooled.select(size(col("mean_embedding"))).distinct().as[Int].collect().toSeq == Seq(64))
  }
}
