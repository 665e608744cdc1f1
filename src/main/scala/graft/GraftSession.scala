package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Session + table helpers shared by the library, Verify, Bench and tests.
  *
  * Scale notes: shuffle partitions default small for local[32]; on a real
  * cluster callers override via `spark.sql.shuffle.partitions` / AQE.
  */
object GraftSession {

  /** Apply graft's recommended conf to a builder (AQE on, ANSI off for
    * permissive EDI-style coercions — the reference engine coerces dirty
    * strings, never throws; cf. /root/reference/src/Service/Mapper/Mapper.php:21-52).
    */
  def tune(b: SparkSession.Builder): SparkSession.Builder = b
    .config("spark.sql.extensions", "graft.plans.GraftExtensions")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
    // start shuffles wide and let AQE coalesce DOWN: a fixed low partition
    // count starves large stages (the r5 sf1 audit measured banded minhash
    // 47 s → 34 s at sf1 and 4.3 s → 3.1 s at sf0.1 from this alone), while
    // small stages coalesce back to a handful of partitions for free. On a
    // real cluster this is the standard AQE posture: initial high,
    // runtime-right-sized per stage.
    .config("spark.sql.adaptive.coalescePartitions.initialPartitionNum", "256")
    // events.parquet carries TIMESTAMP(NANOS) which Spark 4 refuses by
    // default; read as long nanos — we convert to epoch millis explicitly,
    // which is also the determinism-safe interchange with the oracle.
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    // CsvSource enforces the reference's skip-ragged-rows semantics through
    // the corrupt-record column; parser-side pruning would skip the arity
    // check on pruned reads (EDI feeds are narrow — pruning buys nothing)
    .config("spark.sql.csv.parser.columnPruning.enabled", "false")

  def local(threads: Int = 4): SparkSession = {
    val s = tune(
      SparkSession
        .builder()
        .master(s"local[$threads]")
        .appName("graft")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.shuffle.partitions", threads.toString)
    ).getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Load one of the standard tables from a scale-factor directory. */
  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  val standardTables: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  /** Register every standard table as a temp view, so the whole engine is
    * also reachable through `spark.sql(...)` (including the injected
    * graft_* functions).
    */
  def registerTables(spark: SparkSession, sfDir: String): Unit =
    standardTables.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
