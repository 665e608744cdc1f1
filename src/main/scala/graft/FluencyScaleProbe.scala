package graft

/** A/B behind [[graft.operators.Fluency.bigramFluency]]'s `preAggregate`
  * knob (`runMain graft.FluencyScaleProbe`): occurrence-probing count
  * joins (default) vs per-(doc, w1, w2) pre-aggregation. Identical result
  * by construction; the measured numbers (sf0.1: 0.8 s vs 1.9 s; sf1:
  * 5.1 s vs 7.0 s warm, gap narrowing 2.3× → 1.4×) are what sets the
  * default to `false` — the pre-aggregation's uniformly-keyed shuffle
  * only pays once the count joins stop broadcasting.
  */
object FluencyScaleProbe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    for (sf <- Seq("/root/testdata/sf0.1", "/root/repo/testdata-sf1")) {
      GraftSession.autoSizeShuffle(spark, sf)
      val docs = spark.read.parquet(s"$sf/documents.parquet")
      for (pre <- Seq(false, true); i <- 1 to 2) {
        val t0 = System.nanoTime()
        val n = graft.operators.Fluency
          .bigramFluency(docs, "doc_id", "text", preAggregate = pre).count()
        graft.operators.Caches.release()
        println(f"[fluency-scale] $sf preAggregate=$pre run$i: " +
          f"${(System.nanoTime() - t0) / 1e9}%.2f s rows=$n")
      }
    }
    spark.stop()
  }
}
