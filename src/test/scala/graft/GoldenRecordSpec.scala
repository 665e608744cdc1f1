package graft

import graft.operators.Caches
import graft.queries.AnalyticsQueries
import org.apache.spark.sql.functions._

/** Golden-record materializer: conservation and absorption invariants on
  * the real table, and the linkage rule on a hand fixture (via the same
  * name-grain composition the query uses).
  */
class GoldenRecordSpec extends SparkSpec {
  import spark.implicits._

  test("golden records conserve members and absorb every planted typo") {
    val out = AnalyticsQueries.qGoldenRecord(spark, sfDir).collect()
    Caches.release()
    val parts = spark.read.parquet(s"$sfDir/part.parquet")
    val nParts = parts.count()
    val nDupes = parts.filter(
      pmod(graft.functions.Sampling.md5Lower(col("p_partkey")), lit(5)) === 0).count()
    // conservation: every record (base + planted dupe) lands in exactly
    // one golden record
    assert(out.map(_.getLong(3)).sum == nParts + nDupes)
    // every golden id is a real record id; re-keyed dupes never win the
    // min (they sit at +10M)
    assert(out.forall(_.getLong(0) < 10000000L))
    // absorption: there are fewer golden records than distinct base names
    // only if typo bridges merged base names; at minimum, no typo name
    // may survive as its own golden record with a single member that is a
    // planted dupe
    val dupeOnly = out.filter(r => r.getLong(3) == 1 && r.getLong(0) >= 10000000L)
    assert(dupeOnly.isEmpty)
  }

  test("name-grain linkage: one-char typos merge, two-char edits stay apart") {
    // replicate the query's composition on a fixture
    val records = Seq(
      (1L, "acme corp"), (2L, "acme corp"), (3L, "acme cor"), // typo of 1/2
      (4L, "zenith ltd"), (5L, "zenth ltd"),                  // typo of 4
      (6L, "omega gmbh")                                      // singleton
    ).toDF("rid", "name")
    val names = records.select("name").distinct()
    val v = names.withColumn("variant",
      explode(graft.operators.FuzzyLink.deletionVariants(col("name"))))
    val edges = v.as("a").join(v.as("b"),
        col("a.variant") === col("b.variant") && col("a.name") < col("b.name"))
      .select(col("a.name").as("src"), col("b.name").as("dst")).distinct()
      .filter(levenshtein(col("src"), col("dst")) <= 1)
    val labels = graft.operators.Graph.connectedComponents(edges, "src", "dst")
      .withColumnRenamed("node", "name")
    val golden = records.join(labels, Seq("name"), "left")
      .select(col("rid"), coalesce(col("comp"), col("name")).as("cluster"))
      .groupBy("cluster").agg(min("rid").as("gid"), count(lit(1)).as("n"))
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    Caches.release()
    assert(golden == Map(1L -> 3L, 4L -> 2L, 6L -> 1L))
  }
}
