package graft

import graft.operators.Compaction

/** Compaction planner ([[graft.operators.Compaction]]): planted-listing
  * bin algebra, conservation invariants, and a driver model of the
  * registered query's full pseudo-file path.
  */
class CompactionSpec extends SparkSpec {
  import spark.implicits._

  test("prefix-sum packing: bins split exactly where the running size crosses target") {
    // sizes 1000,1000,1000,5000,100 @ target 2000:
    // cum_before = 0,1000,2000,3000,8000 -> bins 0,0,1,1,4
    val files = Seq(
      ("s", 0, 1L, 1000L), ("s", 1, 1L, 1000L), ("s", 2, 1L, 1000L),
      ("s", 3, 1L, 5000L), ("s", 4, 1L, 100L)
    ).toDF("source", "file_id", "n_docs", "bytes")
    val got = Compaction.plan(files, 2000L).orderBy("bin_id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(4), r.getInt(5), r.getInt(6), r.getDouble(7)))
    assert(got.toSeq === Seq(
      (0L, 2L, 2000L, 0, 1, 1.0),
      (1L, 2L, 6000L, 2, 3, 3.0),
      (4L, 1L, 100L, 4, 4, 100.0 / 2000.0)))
  }

  test("partitions pack independently; empty window start gets bin 0") {
    val files = Seq(("a", 0, 1L, 10L), ("b", 0, 1L, 999999L), ("b", 1, 1L, 1L))
      .toDF("source", "file_id", "n_docs", "bytes")
    val got = Compaction.plan(files, 100L).orderBy("source", "bin_id").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got === Seq(("a", 0L, 1L), ("b", 0L, 1L), ("b", 9999L, 1L)))
  }

  test("q_compaction_plan conserves bytes/docs and matches a driver model") {
    val docs = spark.read.parquet(s"$sfDir/documents.parquet")
      .select("source", "doc_id", "n_chars").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
    def md5Lower(s: String): BigInt = {
      val d = java.security.MessageDigest.getInstance("MD5").digest(s.getBytes("UTF-8"))
      (15 to 8 by -1).map(i => BigInt(d(i) & 0xff)).reduce((a, b) => (a << 8) | b)
    }
    val files = docs.groupBy { case (src, id, _) => (src, (md5Lower(id.toString) % 64).toInt) }
      .map { case ((src, fid), rows) => (src, fid, rows.length.toLong, rows.map(_._3).sum) }
      .toSeq.sortBy(f => (f._1, f._2))
    val want = files.groupBy(_._1).toSeq.flatMap { case (src, fs) =>
      val sorted = fs.sortBy(_._2)
      val cumBefore = sorted.scanLeft(0L)(_ + _._4).init
      sorted.zip(cumBefore).groupBy { case (_, cb) => cb / 4096L }.map { case (bin, members) =>
        val m = members.map(_._1)
        (src, bin, m.size.toLong, m.map(_._3).sum, m.map(_._4).sum,
          m.map(_._2).min, m.map(_._2).max, m.map(_._4).sum.toDouble / 4096.0)
      }
    }.sortBy(r => (r._1, r._2))
    val got = graft.queries.LlmQueries.qCompactionPlan(spark, sfDir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4),
        r.getInt(5), r.getInt(6), r.getDouble(7))).toSeq
    assert(got === want)
    // conservation: the plan moves every byte and every doc exactly once
    assert(got.map(_._5).sum === docs.map(_._3).sum)
    assert(got.map(_._4).sum === docs.length.toLong)
  }
}
