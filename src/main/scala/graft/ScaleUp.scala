package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic ×10 scale-up of the sf0.1 test tables → an "sf1" directory
  * for scale benchmarking (`runMain graft.ScaleUp [srcDir destDir]`). The
  * driver provides sf ≤ 0.1 only; scale claims above that need data, so the
  * generator derives it — no RNG anywhere, so the output is a pure function
  * of the input.
  *
  * Replica r ∈ 0..9 (r = 0 is the identity — sf0.1 is a subset of sf1):
  *
  *  - every ENTITY key maps k → k·10 + r in all tables that carry it
  *    (custkey, suppkey, partkey, orderkey, event/user ids, doc_id,
  *    vec_id), so foreign-key joins line up within a replica and
  *    cardinalities scale exactly ×10. nation/region keys are DIMENSION
  *    identity (25/5 rows) and stay fixed, like a real 100 TB corpus keeps
  *    its country table.
  *  - document TEXT gets a per-replica token namespace (each token prefixed
  *    `q<r>`): word sets across replicas are disjoint, so dedup/near-dup
  *    cluster structure replicates ×10 LINEARLY instead of creating
  *    cross-replica mega-clusters (appending a marker token would make
  *    every replica pair a ≥0.9-jaccard near-dup — a quadratic corpus no
  *    real crawl has).
  *  - EMBEDDINGS rotate cyclically by r·13 positions: within-replica inner
  *    products (and therefore every ANN/near-dup result shape) are
  *    preserved exactly; cross-replica cosines decorrelate to background.
  *
  * Within-replica query structure is therefore identical to sf0.1 — a
  * query's sf0.1 → sf1 wall-clock ratio isolates the ENGINE's scaling, not
  * a data-shape change.
  */
object ScaleUp {
  private val Reps = 10

  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dest = if (args.length > 1) args(1) else "testdata-sf1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def t(name: String) = spark.read.parquet(s"$src/$name.parquet")
    def write(name: String, df: DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dest/$name.parquet")
      println(s"[scaleup] $name: ${spark.read.parquet(s"$dest/$name.parquet").count()} rows")
    }

    // replicate df over r = 0..9, remapping the named key columns k*10+r
    def replicate(df: DataFrame, keyCols: Seq[String])(extra: (DataFrame, Column) => DataFrame = (d, _) => d): DataFrame = {
      val withR = df.crossJoin(spark.range(Reps).select(col("id").as("__r")))
      val remapped = keyCols.foldLeft(withR)((d, k) =>
        d.withColumn(k, col(k) * Reps + col("__r")))
      extra(remapped, col("__r")).drop("__r")
    }

    write("region", t("region"))
    write("nation", t("nation"))
    write("customer", replicate(t("customer"), Seq("c_custkey"))())
    write("supplier", replicate(t("supplier"), Seq("s_suppkey"))())
    write("part", replicate(t("part"), Seq("p_partkey"))())
    write("orders", replicate(t("orders"), Seq("o_orderkey", "o_custkey"))())
    write("lineitem", replicate(t("lineitem"), Seq("l_orderkey", "l_partkey", "l_suppkey"))())
    write("events", replicate(t("events"), Seq("event_id", "user_id"))())
    write("documents", replicate(t("documents"), Seq("doc_id")) { (d, r) =>
      // per-replica token namespace; r=0 keeps the original text verbatim
      d.withColumn("text",
        when(r === 0, col("text"))
          .otherwise(regexp_replace(col("text"), lit("(\\S+)"),
            concat(lit("q"), r.cast("string"), lit("$1")))))
    })
    write("embeddings", replicate(t("embeddings"), Seq("vec_id")) { (d, r) =>
      val dim = 64
      val shift = (r * lit(13)) % lit(dim)
      d.withColumn("embedding",
        when(r === 0, col("embedding"))
          .otherwise(concat(
            slice(col("embedding"), shift + 1, lit(dim) - shift),
            slice(col("embedding"), lit(1), shift))))
    })
    spark.stop()
  }
}
