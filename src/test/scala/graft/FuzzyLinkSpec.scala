package graft

import graft.operators.FuzzyLink

/** Deletion-neighborhood fuzzy linkage ([[graft.operators.FuzzyLink]]):
  * variant generation, exactness for distance ≤ 1 against a brute-force
  * model, and the registered query's report shape.
  */
class FuzzyLinkSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1)((i, j) => if (i == 0) j else if (j == 0) i else 0)
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  test("deletionVariants: identity plus each single deletion, deduplicated") {
    val got = Seq("abca").toDF("s")
      .select(org.apache.spark.sql.functions.explode(
        FuzzyLink.deletionVariants(org.apache.spark.sql.functions.col("s"))))
      .as[String].collect().toSet
    assert(got === Set("abca", "bca", "aca", "aba", "abc"))
    // run of repeats dedupes: "aab" deletions are {ab, ab, aa} -> {ab, aa}
    val run = Seq("aab").toDF("s")
      .select(org.apache.spark.sql.functions.explode(
        FuzzyLink.deletionVariants(org.apache.spark.sql.functions.col("s"))))
      .as[String].collect()
    assert(run.length === 3 && run.toSet === Set("aab", "ab", "aa"))
  }

  test("linkByDeletion finds EXACTLY the pairs at levenshtein distance <= 1") {
    val master = Seq((1L, "order-1001"), (2L, "order-1002"), (3L, "order-2001"),
      (4L, "invoice-77"), (5L, "order-10012")).toDF("id", "name")
    val probe = Seq(
      (10L, "order-101"),   // deletion of 0 -> matches 1001? lev(order-101, order-1001)=1; 1002/2001 at 2
      (11L, "order-1002"),  // exact match of 2, lev 1 of 1 (substitution)
      (12L, "invoce-77"),   // deletion inside invoice-77
      (13L, "zzzz")         // matches nothing
    ).toDF("id", "name")
    val got = FuzzyLink.linkByDeletion(master, "id", "name", probe, "id", "name")
      .select("probe_id", "master_id").as[(Long, Long)].collect().toSet
    val masters = Seq((1L, "order-1001"), (2L, "order-1002"), (3L, "order-2001"),
      (4L, "invoice-77"), (5L, "order-10012"))
    val probes = Seq((10L, "order-101"), (11L, "order-1002"), (12L, "invoce-77"), (13L, "zzzz"))
    val want = (for ((pi, pn) <- probes; (mi, mn) <- masters if lev(pn, mn) <= 1)
      yield (pi, mi)).toSet
    assert(got === want && want.contains((11L, 2L)) && want.contains((11L, 1L)) &&
      !want.exists(_._1 == 13L))
  }

  test("q_fuzzy_link matches a brute-force driver model exactly") {
    def md5Lower(s: String): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (15 to 8 by -1).map(i => BigInt(d(i) & 0xff)).reduce((a, b) => (a << 8) | b)
    }
    val masters = spark.read.parquet(s"$sfDir/customer.parquet")
      .select("c_custkey", "c_name").collect()
      .map(r => (r.getLong(0), r.getString(1))).toSeq
    val probes = masters.filter { case (k, _) => md5Lower(k.toString) % 5 == 0 }
      .map { case (k, n) =>
        val p = (md5Lower(s"fz:$k") % n.length).toInt
        (k, n.substring(0, p) + n.substring(p + 1))
      }
    val want = probes.flatMap { case (pid, pn) =>
      val cands = masters.map { case (mi, mn) => (lev(pn, mn), mi, mn) }.filter(_._1 <= 1)
      if (cands.isEmpty) None
      else { val best = cands.min; Some((pid, pn, best._2, best._3, best._1, cands.size.toLong)) }
    }.sortBy(_._1)
    val got = graft.queries.AnalyticsQueries.qFuzzyLink(spark, sfDir).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3),
        r.getInt(4), r.getLong(5))).toSeq
    assert(got.nonEmpty && got === want)
    // the true source is always a candidate (re-inserting the deleted char),
    // so every probe links at distance exactly 1 (lengths differ, so never 0)
    assert(got.forall(_._5 == 1))
    // pad-zero deletions are genuinely ambiguous — the report must say so
    assert(got.exists(_._6 > 1L))
  }
}
