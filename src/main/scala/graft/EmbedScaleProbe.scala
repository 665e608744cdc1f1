package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** sf0.1 → sf1 scale evidence for the EMBEDDING dedup family
  * (`runMain graft.EmbedScaleProbe`) — closes the r5 audit hole: the
  * oracle-forced q_dedup_embed_lsh corpus is quadratic-by-construction
  * (weak threshold, saturated recall), so scaling THAT corpus measures the
  * corpus, not the engine. This probe builds a SCALE-SHAPED corpus instead:
  *
  *  - background: md5-derived pseudo-random dim-64 vectors — pairwise
  *    cosines concentrate near 0 (σ ≈ 1/8), nothing clears the 0.8
  *    threshold;
  *  - planted structure: 1% of ids carry a near-duplicate (v + 0.2·u,
  *    cosine ≈ 0.98) — the linear near-dup mass a deduplicated crawl
  *    actually has.
  *
  * Everything is hash-derived — the corpus is a pure function of (N, dim),
  * no RNG — and the 10× corpus contains the 1× corpus's structure shape.
  *
  * Configs measured at BOTH N and 10N:
  *  - LSH near-dup pairs at the production config 8 tables × 16 planes
  *    (2^16 buckets/table ≫ corpus at both sizes, so bucket occupancy —
  *    and with it per-task candidate work — stays O(corpus/buckets);
  *    recall at cosine ≈ 0.98 is 1−(1−0.937^16)^8 ≈ 0.97, asserted ≥ 0.95
  *    against the planted count — measured 54/55 and 530/550);
  *  - SemDeDup at BOUNDED CELL SIZE: nlist scales with the corpus
  *    (64 → 640), holding |cell| ≈ constant — the published SemDeDup
  *    tuning (clusters ∝ corpus) and the same trade the IVF docstring
  *    pins. The fixed-nlist variant is quadratic BY DESIGN (per-cell
  *    O(|cell|²) with |cell| ∝ corpus) and is already documented as such
  *    in SCALE_r05; this probe measures the production path.
  */
object EmbedScaleProbe {
  private val Dim = 64

  /** Deterministic corpus: `n` background vectors + n/100 planted
    * near-dups of ids ≡ 0 (mod 100), appended with ids ≥ n.
    */
  def corpus(spark: SparkSession, n: Long): DataFrame = {
    def hvec(keyPrefix: String, idCol: String): org.apache.spark.sql.Column =
      transform(sequence(lit(0), lit(Dim - 1)), j =>
        (graft.plans.NativeHash.md5Mod(
          concat(lit(keyPrefix), col(idCol).cast("string"), lit(":"), j.cast("string")),
          1000L).cast("double") / 1000.0 - 0.5).cast("float"))
    val bg = spark.range(n).select(col("id").as("vec_id"), hvec("v:", "id").as("embedding"))
    val planted = spark.range(n / 100).select(
        (col("id") + n).as("vec_id"),
        (col("id") * 100).as("__src"))
      .select(col("vec_id"),
        zip_with(hvec("v:", "__src"), hvec("p:", "vec_id"),
          (a, b) => (a + b * lit(0.2f)).cast("float")).as("embedding"))
    bg.unionByName(planted)
  }

  def main(args: Array[String]): Unit = {
    val spark = GraftSession.local(32)
    spark.sparkContext.setLogLevel("WARN")
    val nSmall = sys.env.getOrElse("PROBE_N", "5500").toLong
    val results = scala.collection.mutable.LinkedHashMap.empty[String, Double]
    for ((n, tag) <- Seq((nSmall, "sf0.1"), (nSmall * 10, "sf1"))) {
      val vecs = corpus(spark, n).persist()
      val planted = n / 100
      vecs.count()

      // --- LSH near-dup: fixed production config at both scales ---------
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val pairs = graft.operators.Dedup.embedNearDupPairsLsh(
          vecs, "vec_id", "embedding", threshold = 0.8,
          nTables = 8, planesPerTable = 16).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Caches.release()
        if (i == 2) results(s"lsh_$tag") = dt
        println(f"[embed-scale] $tag n=$n lsh run$i: $dt%.2f s, pairs=$pairs (planted=$planted)")
        require(pairs >= (planted * 95) / 100,
          s"LSH recall below 0.95: $pairs of $planted planted pairs")
      }

      // --- SemDeDup: bounded cell size (nlist scales with corpus) -------
      val nlist = if (tag == "sf1") 640 else 64
      val cents = graft.operators.Ann
        .trainIvfCentroids(vecs, "vec_id", "embedding", nlist = nlist, iters = 1)
        .persist()
      cents.count()
      for (i <- 1 to 2) {
        val t0 = System.nanoTime()
        val kept = graft.operators.Dedup.dropDuplicatesSemantic(
          vecs, "vec_id", "embedding", cents, threshold = 0.8).count()
        val dt = (System.nanoTime() - t0) / 1e9
        graft.operators.Caches.release()
        if (i == 2) results(s"semdedup_$tag") = dt
        println(f"[embed-scale] $tag n=$n semdedup(nlist=$nlist) run$i: $dt%.2f s, kept=$kept")
      }
      cents.unpersist()
      vecs.unpersist()
    }
    val js = results.map { case (k, v) => s""""$k":${"%.3f".format(v)}""" }.mkString(",")
    println(s"""[embed-scale] {"metric":"embed_scale","unit":"sec",$js,""" +
      s""""lsh_ratio":${"%.2f".format(results("lsh_sf1") / results("lsh_sf0.1"))},""" +
      s""""semdedup_ratio":${"%.2f".format(results("semdedup_sf1") / results("semdedup_sf0.1"))}}""")
    spark.stop()
  }
}
