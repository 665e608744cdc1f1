package graft.operators

import graft.functions.VectorFunctions
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an `array<float>` embedding
  * column (SURVEY.md §2.3).
  */
object Ann {

  /** Brute-force cosine top-k: the correctness baseline. Queries broadcast
    * (they are few); candidates stream — one pass over the corpus, no
    * shuffle until the per-query top-k window.
    */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"))
    val scored = c.join(broadcast(q), col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }

  /** IVF (inverted-file) ANN: partition the corpus into `nlist` Voronoi
    * cells around trained centroids; a query scans only its `nprobe`
    * nearest cells. The standard coarse-quantizer scale path: per-query
    * work drops from |corpus| to ~nprobe/nlist of it, and the cell
    * assignment is a plain equi-join key — shuffle-friendly at 100 TB.
    *
    * Training here is deterministic k-means: seeds = the `nlist` vectors
    * with the lowest ids, `iters` Lloyd rounds run as DataFrame ops
    * (assign = broadcast-centroids argmin; update = posexplode + per-
    * dimension avg). With `nprobe == nlist` results equal brute force
    * exactly (the spec asserts this).
    */
  def ivfTopK(queries: DataFrame, corpus: DataFrame, idCol: String, vecCol: String,
              k: Int, nlist: Int = 16, nprobe: Int = 4, iters: Int = 1): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"), col(vecCol).as("v"))

    // seed ids assigned on the driver: nlist rows by construction, and a
    // window with no partition spec would log a misleading scale warning
    val spark = corpus.sparkSession
    import spark.implicits._
    var centroids = spark.createDataset(
        c.orderBy("vid").limit(nlist).select("v").as[Array[Float]].collect()
          .zipWithIndex.map { case (v, i) => (i, v) }.toSeq)
      .toDF("cid", "centroid")
    for (_ <- 0 until iters) {
      val assigned = assignToNearest(c, centroids)
      centroids = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos").agg(avg("x").as("m"))
        .groupBy("cid")
        .agg(transform(array_sort(collect_list(struct(col("pos"), col("m")))),
          s => s.getField("m").cast("float")).as("centroid"))
    }

    val cells = assignToNearest(c, centroids)                       // corpus → cell
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"))
    val probes = q.crossJoin(broadcast(centroids))
      .withColumn("d", VectorFunctions.cosine(col("qv"), col("centroid")))
      .withColumn("pr", row_number().over(Window.partitionBy("query_id").orderBy(col("d").desc, col("cid"))))
      .filter(col("pr") <= nprobe)
      .select("query_id", "qv", "cid")

    val scored = cells.join(probes, Seq("cid"))
      .filter(col("query_id") =!= col("vid"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("v")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("vid"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("vid").as("neighbor_id"), col("cosine"), col("rank"))
  }

  /** Nearest-centroid assignment: broadcast the (small) centroid table,
    * argmin by cosine distance.
    */
  private def assignToNearest(c: DataFrame, centroids: DataFrame): DataFrame = {
    val w = Window.partitionBy("vid").orderBy(col("d").desc, col("cid"))
    c.crossJoin(broadcast(centroids))
      .withColumn("d", VectorFunctions.cosine(col("v"), col("centroid")))
      .withColumn("r", row_number().over(w))
      .filter(col("r") === 1)
      .select("vid", "v", "cid")
  }

  /** LSH-bucketed ANN: bucket by sign-bit hyperplane hash, rank only within
    * the query's bucket. The 100 TB path — per-task candidate sets are
    * bucket-bounded instead of corpus-sized. Recall < 1 by construction;
    * pair with multi-probe or more planes per the recall target.
    */
  def lshTopK(queries: DataFrame, corpus: DataFrame, idCol: String,
              vecCol: String, k: Int, nPlanes: Int = 8): DataFrame = {
    val q = queries.select(col(idCol).as("query_id"), col(vecCol).as("qv"),
      VectorFunctions.lshBucket(col(vecCol), nPlanes).as("bucket"))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cv"),
      VectorFunctions.lshBucket(col(vecCol), nPlanes).as("bucket"))
    val scored = c.join(broadcast(q), Seq("bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .withColumn("cosine", VectorFunctions.cosine(col("qv"), col("cv")))
    val w = Window.partitionBy("query_id").orderBy(col("cosine").desc, col("neighbor_id"))
    scored
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select("query_id", "neighbor_id", "cosine", "rank")
  }
}
