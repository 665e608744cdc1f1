package graft

import graft.operators.Cdc
import org.apache.spark.sql.functions._

/** Content-defined chunking (`Cdc.chunks`/`dedupStats`): a driver-side
  * reference model pins the cut rule, the resync property (the reason CDC
  * exists) is proven against fixed-width chunking on an edited document,
  * and the dedup accounting is checked on a corpus with planted
  * duplication.
  */
class CdcSpec extends SparkSpec {
  import spark.implicits._

  private val K = 8
  private val Mask = "00"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** Reference model of the documented chunking rule (1-based positions). */
  private def cdcRef(text: String): Seq[(Int, Int, String)] = {
    val n = text.length
    val cuts = (K to n).filter(i => md5hex(text.substring(i - K, i)).startsWith(Mask))
    val starts = 1 +: cuts.map(_ + 1)
    val ends = cuts :+ n
    starts.zip(ends).filter { case (s, e) => e >= s }
      .map { case (s, e) => (s, e - s + 1, md5hex(text.substring(s - 1, e))) }
  }

  private def run(docs: Seq[(Long, String)]): Map[Long, Seq[(Int, Int, String)]] =
    Cdc.chunks(docs.toDF("doc_id", "text"), "doc_id", "text", K, Mask)
      .collect()
      .map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4))))
      .groupBy(_._1)
      .map { case (id, rs) => id -> rs.map(_._2).sortBy(_._1).map(t => (t._2, t._3, t._4)).toSeq }

  // deterministic pseudo-random text with enough entropy to contain cuts
  private def noise(seed: Int, n: Int): String = {
    val r = new scala.util.Random(seed)
    (0 until n).map(_ => ('a' + r.nextInt(26)).toChar).mkString
  }

  test("operator matches the reference model (cuts, short docs, empty text)") {
    val docs = Seq(
      1L -> noise(7, 3000),   // long: near-certainly multiple cuts
      2L -> noise(8, 40),     // short: likely zero cuts → one chunk
      3L -> "abc",            // below the window: single whole-doc chunk
      4L -> "")               // empty: no chunks at all
    val got = run(docs)
    val want = docs.map { case (id, t) => id -> cdcRef(t) }.filter(_._2.nonEmpty).toMap
    assert(got === want)
    assert(run(Seq(1L -> noise(7, 3000)))(1L).size > 3, "fixture must actually cut")
  }

  test("resync: a prefix edit preserves most chunk hashes; fixed-width loses them") {
    val base = noise(42, 5000)
    val edited = noise(99, 13) + base // insert 13 chars at the front
    val ch = run(Seq(1L -> base, 2L -> edited))
    val h1 = ch(1L).map(_._3)
    val h2 = ch(2L).map(_._3).toSet
    val shared = h1.count(h2)
    assert(shared >= h1.size - 2,
      s"CDC must re-align after the edit window: shared $shared of ${h1.size}")
    // fixed-width 256-char chunking of the same pair shares NO chunk
    val fixedShared = base.grouped(256).map(md5hex).toSet
      .intersect(edited.grouped(256).map(md5hex).toSet)
    assert(fixedShared.isEmpty)
  }

  test("deltaStats: planted edit/insert/delete/move accounting matches the model exactly") {
    val a = noise(11, 5000); val b = noise(12, 5000)
    val old = Seq(1L -> a, 2L -> b, 3L -> noise(13, 5000))
    // t+1: doc 1 prefix-edited (resync case), doc 2 unchanged, doc 3
    // DELETED, doc 4 INSERTED (all-new content), doc 5 = doc 2's content
    // under a new id (the moved case — content addressing must reuse it)
    val next = Seq(1L -> (noise(14, 13) + a), 2L -> b, 4L -> noise(15, 5000), 5L -> b)
    val r = Cdc.deltaStats(old.toDF("doc_id", "text"), next.toDF("doc_id", "text"),
      "doc_id", "text", K, Mask).head()
    val (nc, nr, nn, ct, cn) =
      (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
    // exact expectation from the reference chunker
    val oldHashes = old.flatMap { case (_, t) => cdcRef(t).map(_._3) }.toSet
    val newChunks = next.flatMap { case (_, t) => cdcRef(t) }
    val wantReused = newChunks.count(c => oldHashes(c._3)).toLong
    assert(nc === newChunks.size.toLong)
    assert(nr === wantReused && nn === nc - wantReused)
    assert(ct === next.map(_._2.length.toLong).sum)
    assert(cn === newChunks.filterNot(c => oldHashes(c._3)).map(_._2.toLong).sum)
    // the structure the report exists to show: the edit disturbs at most 2
    // of doc 1's chunks, the move reuses everything, the insert is new
    val d1new = cdcRef(next.head._2).count(c => !oldHashes(c._3))
    assert(d1new <= 2, s"resync failed: $d1new new chunks after a prefix edit")
    assert(cdcRef(b).forall(c => oldHashes(c._3)))
    assert(nn >= cdcRef(next(2)._2).size.toLong, "inserted doc must be new mass")
  }

  test("a mask longer than an md5 digest is rejected at construction") {
    // 33 nibbles would index past the 16-byte digest at eval time — the
    // native expression must refuse it up front, like the hex-char check
    val bad = "0" * 33
    intercept[IllegalArgumentException] {
      Cdc.chunks(Seq(1L -> "abc").toDF("doc_id", "text"), "doc_id", "text", K, bad)
    }
    // 32 nibbles (a full digest) is the legal maximum and must construct
    Cdc.chunks(Seq(1L -> "abcdefghij").toDF("doc_id", "text"), "doc_id", "text",
      K, "0" * 32).collect()
  }

  test("dedupStats: duplicated corpus saves chars; accounting is consistent") {
    val a = noise(1, 4000); val b = noise(2, 4000)
    val corpus = Seq(1L -> a, 2L -> b, 3L -> a, 4L -> (a + b))
    val r = Cdc.dedupStats(corpus.toDF("doc_id", "text"), "doc_id", "text", K, Mask).head()
    val (nc, nd, ct, cd) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(ct === corpus.map(_._2.length.toLong).sum)
    assert(nd < nc && cd < ct, s"planted duplication must dedup: $r")
    // distinct chars can't beat the distinct content lower bound
    assert(cd >= 0 && nd >= 1)
  }
}
