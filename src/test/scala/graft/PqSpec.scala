package graft

import graft.operators.Pq
import org.apache.spark.sql.functions._

/** Product quantization (`Pq`): a driver-side reference model pins the
  * per-subspace Lloyd training (seeds, integer argmin with lowest-cid
  * ties, floor-mean update, empty-cell carry), encoding matches the model
  * on fixtures and the real table, and ADC search recovers planted
  * near-duplicate structure through the m-byte codes.
  */
class PqSpec extends SparkSpec {
  import spark.implicits._

  private def quantize(v: Seq[Float]): Array[Long] =
    v.map(x => math.round(x.toDouble * 1000000.0)).toArray

  /** Pure-Scala reference: identical seed/assign/update contract. */
  private def refTrain(vs: Seq[(Long, Seq[Float])], m: Int, ksub: Int,
                       iters: Int): Array[Array[Array[Long]]] = {
    val q = vs.sortBy(_._1).map { case (id, v) => id -> quantize(v) }
    val dim = q.head._2.length
    val sub = dim / m
    val seeds = q.take(ksub).map(_._2)
    var books = Array.tabulate(m, seeds.length)((s, c) => seeds(c).slice(s * sub, (s + 1) * sub))
    for (_ <- 0 until iters) {
      val asg = q.map { case (_, v) => refAssign(v, books, sub) }
      val upd = books.map(_.map(_.clone()))
      for (s <- 0 until m; c <- books(s).indices) {
        val members = q.zip(asg).collect { case ((_, v), a) if a(s) == c => v }
        if (members.nonEmpty) for (p <- 0 until sub) {
          upd(s)(c)(p) = Math.floorDiv(members.map(_(s * sub + p)).sum, members.length.toLong)
        }
      }
      books = upd
    }
    books
  }

  private def refAssign(v: Array[Long], books: Array[Array[Array[Long]]], sub: Int): Seq[Int] =
    books.indices.map { s =>
      val sl = v.slice(s * sub, (s + 1) * sub)
      books(s).zipWithIndex.map { case (cv, ci) =>
        (cv.zip(sl).map { case (a, b) => (b - a) * (b - a) }.sum, ci)
      }.min._2
    }

  private val fixture: Seq[(Long, Seq[Float])] = (0L until 24L).map { i =>
    i -> (0 until 8).map(j => (math.sin(i * 0.83 + j * 1.7) * (j % 3 + 1) - 0.4).toFloat).toSeq
  }

  test("trained codebooks match the reference model (m=2, ksub=4, 2 rounds)") {
    val books = Pq.train(fixture.toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    val ref = refTrain(fixture, m = 2, ksub = 4, iters = 2)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq === ref.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("codes match the reference assignment; empty clusters keep their seed slice") {
    val books = Pq.train(fixture.toDF("vec_id", "embedding"), "vec_id", "embedding",
      m = 2, ksub = 4, iters = 2)
    val got = Pq.codes(fixture.toDF("vec_id", "embedding"), "vec_id", "embedding", books)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    val sub = 4
    for ((id, v) <- fixture) {
      val a = refAssign(quantize(v), books, sub)
      for (s <- a.indices) assert(got((id, s)) == a(s), s"id=$id sub=$s")
    }
  }

  test("operator matches the reference model on the real embeddings table (m=4, ksub=16)") {
    val rows = spark.read.parquet(s"$sfDir/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toSeq)).toSeq
    val df = spark.read.parquet(s"$sfDir/embeddings.parquet")
    val books = Pq.train(df, "vec_id", "embedding", m = 4, ksub = 16, iters = 2)
    val ref = refTrain(rows, m = 4, ksub = 16, iters = 2)
    assert(books.map(_.map(_.toSeq).toSeq).toSeq === ref.map(_.map(_.toSeq).toSeq).toSeq)
    val got = Pq.codes(df, "vec_id", "embedding", books)
      .collect().map(r => ((r.getLong(0), r.getInt(1)), r.getInt(2))).toMap
    for ((id, v) <- rows; (c, s) <- refAssign(quantize(v), books, 16).zipWithIndex)
      assert(got((id, s)) == c, s"id=$id sub=$s")
  }

  test("ADC search recovers planted twins through the m-byte codes") {
    // the VectorLshSpec planted corpus: 60 base + 30 twins at 5% noise
    def mdVal(s: String): Double = {
      val d = java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var v = 0L
      var i = 15
      while (i >= 8) { v = (v << 8) | (d(i) & 0xffL); i -= 1 }
      java.lang.Long.remainderUnsigned(v, 2000L) / 1000.0 - 1.0
    }
    val dim = 32
    val base = Array.tabulate(60, dim)((i, j) => mdVal(s"vec$i:$j").toFloat)
    val twin = Array.tabulate(30, dim)((i, j) => (base(i)(j) + 0.05 * mdVal(s"noise$i:$j")).toFloat)
    val all = (base ++ twin).zipWithIndex.map { case (v, i) => (i.toLong, v.toSeq) }.toSeq
      .toDF("vec_id", "embedding")
    val books = Pq.train(all, "vec_id", "embedding", m = 4, ksub = 16, iters = 2)
    val top1 = Pq.annTopKAdc(all.filter(col("vec_id") >= 60), all,
        "vec_id", "embedding", books, k = 1)
      .select("query_id", "neighbor_id")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hits = (0 until 30).count(i => top1(60L + i) == i.toLong)
    assert(hits >= 24, s"ADC top-1 recall too low: $hits/30")
  }

  test("rejects a dimension that does not split into m subspaces") {
    val e = intercept[IllegalArgumentException] {
      Pq.train(fixture.toDF("vec_id", "embedding"), "vec_id", "embedding",
        m = 3, ksub = 2, iters = 1)
    }
    assert(e.getMessage.contains("not divisible"))
  }
}
