package graft

/** Embedding norm audit (`q_embed_norm_audit`): planted degenerate
  * vectors with hand-computed norms, and a driver model on the real
  * store.
  */
class EmbedNormAuditSpec extends SparkSpec {
  import spark.implicits._

  test("planted store: exact norms, zero-vector count, known percentiles") {
    val df = Seq(
      (0, Seq(3f, 4f)),   // norm 5.0 -> 5_000_000
      (0, Seq(0f, 0f)),   // zero vector
      (0, Seq(3f, 4f)),
      (1, Seq(1f, 0f))    // norm 1.0
    ).toDF("label", "embedding")
    // reuse the registered machinery by writing a temp store
    val dir = java.nio.file.Files.createTempDirectory("ena").toString
    df.write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    val got = graft.queries.LlmQueries.qEmbedNormAudit(spark, dir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))
    assert(got.toSeq === Seq(
      (0, 3L, 1L, 5000000L, 5000000L, 5000000L),
      (1, 1L, 0L, 1000000L, 1000000L, 1000000L)))
  }

  test("q_embed_norm_audit matches a driver model") {
    val vecs = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("label", "embedding").collect()
      .map(r => (r.getInt(0), r.getSeq[Float](1)))
    val norms = vecs.map { case (l, v) =>
      (l, math.floor(math.sqrt(v.foldLeft(0.0)((a, x) => a + x.toDouble * x.toDouble)) * 1e6).toLong)
    }
    def pct(vs: Seq[Long], p: Double): Long = {
      val s = vs.sorted; s(math.ceil(s.size * p).toInt - 1)
    }
    val want = norms.groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap.toSeq
      .map { case (l, vs) =>
        (l, vs.size.toLong, vs.count(_ == 0L).toLong, pct(vs, 0.5), pct(vs, 0.9), pct(vs, 0.99))
      }.sortBy(_._1)
    val got = graft.queries.LlmQueries.qEmbedNormAudit(spark, sfDir).collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toSeq
    assert(got === want && got.nonEmpty)
  }
}
